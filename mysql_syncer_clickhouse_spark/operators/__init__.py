from .upsert import apply_snapshot_and_changelog, fill_partial_updates, latest_state

__all__ = ["latest_state", "fill_partial_updates", "apply_snapshot_and_changelog"]
