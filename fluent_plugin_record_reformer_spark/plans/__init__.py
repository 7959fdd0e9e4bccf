from .spec import TransformSpec
from .template import tokenize
from .compiler import ReformContext

__all__ = ["TransformSpec", "tokenize", "ReformContext"]
