from phylo_utils_tpu.parallel.sharding import (  # noqa: F401
    SiteSharding,
    make_mesh,
    distributed_init,
)
