"""Multi-chip sharding: meshes, halo-exchange collectives, sharded streams."""

from .mesh import (  # noqa: F401
    CHANNEL_AXIS,
    HOST_AXIS,
    TIME_AXIS,
    Mesh,
    NamedSharding,
    P,
    channel_time_mesh,
    dsp_mesh,
    init_multihost,
    multihost_mesh,
)
from .sharded import (  # noqa: F401
    halo_exchange_left,
    shard_channels,
    sharded_fir_ols,
    sharded_partitioned_fir,
)
from .dist_fft import (  # noqa: F401
    rspectrum_order,
    sharded_fft_convolve,
    sharded_fft_planes,
    sharded_ifft_planes,
    sharded_irfft_planes,
    sharded_rfft_convolve,
    sharded_rfft_planes,
    spectrum_order,
)
