from .vocabulary import Vocabulary, build_vocabulary, transform
from . import retrieval

__all__ = ["Vocabulary", "build_vocabulary", "transform", "retrieval"]
