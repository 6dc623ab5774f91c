# Default runtime settings (log/ckpt cadence, resume behavior).
checkpoint_config = dict(interval=1)
log_config = dict(interval=50, hooks=[dict(type='TextLoggerHook')])
custom_hooks = [dict(type='NumClassCheckHook')]
log_level = 'INFO'
load_from = None
resume_from = None
auto_resume = False
workflow = [('train', 1)]
# Static-canvas buckets the batcher may use (landscape / portrait).
canvases = [(800, 1344), (1344, 800)]
max_gts = 100
