"""Placeholder — implemented in the streaming-runtime milestone."""
class OnlineStream:  # pragma: no cover
    pass
class OnlineRecognizer:  # pragma: no cover
    pass
