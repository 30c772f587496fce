from .server import ScoringService, serve  # noqa: F401
