from koifish_tpu.utils.profiler import Phase, PhaseTimers, get_timers  # noqa: F401
from koifish_tpu.utils.logging import get_logger, set_level  # noqa: F401
