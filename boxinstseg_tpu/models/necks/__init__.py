from .fpn import FPN
from .pafpn import PAFPN, ChannelMapper

__all__ = ['FPN', 'PAFPN', 'ChannelMapper']
