"""halo2_tpu: a TPU-native halo2 (PLONKish) proving framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
reference Rust halo2 (PSE fork): PLONKish arithmetization, lookup/permutation
arguments, KZG (GWC/SHPLONK) and IPA commitments, Blake2b/Keccak transcripts,
circuit frontend, dev tooling and gadgets.  See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
