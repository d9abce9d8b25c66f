from tpu_sage.nn.aggregators import aggregator_lookup
from tpu_sage.nn.model import GSSupervised, LayerSpec, default_layer_specs
from tpu_sage.nn.preps import prep_lookup

__all__ = [
    "aggregator_lookup",
    "prep_lookup",
    "GSSupervised",
    "LayerSpec",
    "default_layer_specs",
]
