"""Reference cpflow/topology.py surface."""
from cpflow_tpu.topology import (chain_layer, connected_layer,  # noqa: F401
                                 fill_layers, kite_layer,
                                 num_qubits_from_layer, random_placement,
                                 random_placements, square_layer, star_layer)
