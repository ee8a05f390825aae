from . import merkle, poseidon2

__all__ = ["merkle", "poseidon2"]
