from gmres_tpu.io.loader import load_matrix, load_vector
from gmres_tpu.io.rng import rand_vect, MT19937

__all__ = ["load_matrix", "load_vector", "rand_vect", "MT19937"]
