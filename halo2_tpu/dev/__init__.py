from .mock_prover import MockProver, VerifyFailure
