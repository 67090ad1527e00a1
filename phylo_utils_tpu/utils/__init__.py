from phylo_utils_tpu.utils.cache import enable_compile_cache  # noqa: F401
from phylo_utils_tpu.utils.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
from phylo_utils_tpu.utils.metrics import (  # noqa: F401
    MetricsLogger,
    Timer,
    enable_debug_checks,
    trace,
)
