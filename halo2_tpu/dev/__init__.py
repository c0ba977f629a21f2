from .cost import CircuitCost, MarginalProofSize, ProofSize
from .gates import CircuitGates
from .mock_prover import MockProver, VerifyFailure

__all__ = [
    "CircuitCost",
    "CircuitGates",
    "MarginalProofSize",
    "MockProver",
    "ProofSize",
    "VerifyFailure",
]
