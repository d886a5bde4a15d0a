"""xrnerf_tpu — a TPU-native (JAX/XLA/Pallas) NeRF framework.

Covers the method zoo of openxrlab/xrnerf (vanilla NeRF, Mip-NeRF,
Instant-NGP, KiloNeRF, BungeeNeRF, NeuralBody, AniNeRF, GNR) rebuilt
TPU-first: pure-functional models, static shapes, Pallas kernels for the
hot ops, GSPMD sharding for scale-out.
"""

__version__ = "0.1.0"

from .utils.compile_cache import enable_persistent_cache  # noqa: F401

enable_persistent_cache()

from . import registry  # noqa: F401
from .config import Config, load_config  # noqa: F401
from .registry import (  # noqa: F401
    DATASETS,
    EMBEDDERS,
    FIELDS,
    HOOKS,
    NETWORKS,
    PIPELINES,
    RENDERS,
    SAMPLERS,
    build_dataset,
    build_network,
)


def _register_all():
    """Import modules for registry side effects."""
    from .datasets import aninerf as aninerf_data  # noqa: F401
    from .datasets import bungee as bungee_data  # noqa: F401
    from .datasets import genebody as genebody_data  # noqa: F401
    from .datasets import hashnerf as hashnerf_data  # noqa: F401
    from .datasets import kilonerf as kilonerf_data  # noqa: F401
    from .datasets import multiscale, scene  # noqa: F401
    from .datasets import neuralbody as neuralbody_data  # noqa: F401
    from .models.networks import (  # noqa: F401
        aninerf,
        bungeenerf,
        gnr,
        hashnerf,
        kilonerf,
        mipnerf,
        nerf,
        neuralbody,
    )
    from .core import hooks  # noqa: F401


_register_all()
