from .pipeline import StreamingSyncPipeline, SyncMetrics

__all__ = ["StreamingSyncPipeline", "SyncMetrics"]
