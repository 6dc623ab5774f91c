from .fpn import FPN
from .pafpn import PAFPN, ChannelMapper, FPN_CARAFE

__all__ = ['FPN', 'PAFPN', 'ChannelMapper', 'FPN_CARAFE']
