from . import air, challenger, config, fri, pcs, prover, verifier

__all__ = ["air", "challenger", "config", "fri", "pcs", "prover", "verifier"]
