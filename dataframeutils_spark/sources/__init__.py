from dataframeutils_spark.sources.testdata import (
    TABLES,
    load_table,
    lineitem_panel,
    events_bins_input,
)

__all__ = ["TABLES", "load_table", "lineitem_panel", "events_bins_input"]
