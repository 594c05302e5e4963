"""Placeholder — implemented in the offline-runtime milestone."""
class OfflineStream:  # pragma: no cover
    pass
class OfflineRecognizer:  # pragma: no cover
    pass
