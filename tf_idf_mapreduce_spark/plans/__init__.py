from .pipeline import flagship_tfidf

__all__ = ["flagship_tfidf"]
