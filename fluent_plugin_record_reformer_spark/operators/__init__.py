from .reform import reform

__all__ = ["reform"]
