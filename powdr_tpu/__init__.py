"""powdr_tpu — a TPU-native STARK proving framework with the capabilities of
powdr-labs/powdr (autoprecompile synthesis + constraint optimization) plus the
STARK backend powdr outsources to its stark-backend fork.

Two planes (SURVEY.md §7):
  * device plane (JAX/Pallas, mesh-sharded): field kernels -> NTT/LDE ->
    Poseidon2/Keccak Merkle commitment -> AIR quotient evaluation -> LogUp ->
    FRI, all uint32 BabyBear limbs in Montgomery form.
  * host plane (Python + C++ core): expression IR, constraint solver,
    autoprecompile optimizer, RISC-V frontend, AIR->XLA compiler.
"""

__version__ = "0.1.0"
