from ullava_tpu.utils.tools import datetime_print, set_seed  # noqa: F401
from ullava_tpu.utils.profiling import phase_timer, trace  # noqa: F401
