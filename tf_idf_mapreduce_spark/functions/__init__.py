from .tokenize import standardize_token, tokenize, tokenize_text

__all__ = ["standardize_token", "tokenize", "tokenize_text"]
