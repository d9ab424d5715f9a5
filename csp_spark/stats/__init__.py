from .rolling import Rolling, RollingPair
from .ema import ema, ema_var, ema_std, ema_cov
