"""Device-mesh parallelism for frame-batch processing."""

from timg_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    sharded_quarter_pipeline,
)
