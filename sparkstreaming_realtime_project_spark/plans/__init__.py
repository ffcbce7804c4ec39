from .serving import dau_realtime, stats_by_item, detail_by_item

__all__ = ["dau_realtime", "stats_by_item", "detail_by_item"]
