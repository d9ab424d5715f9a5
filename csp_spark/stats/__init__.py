from .rolling import Rolling, RollingPair
from .ema import ema, ema_var, ema_std, ema_cov
from .matrix import cov_matrix, corr_matrix, rolling_cov_matrix
from .resample import ohlc_bars
