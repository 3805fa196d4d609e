from .bottleneck import EntropyBottleneck, bottleneck_indexes, build_bottleneck_cdf
from .categorical import VqCategoricalEntropyModel
from .container import HeaderHandler, load_byte_strings, save_byte_strings
from .driver import Codec
from .gaussian import GaussianConditional, get_scale_table
from .ops import lower_bound, ste_round
