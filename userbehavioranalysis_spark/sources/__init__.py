from userbehavioranalysis_spark.sources.readers import (
    load_testdata,
    read_apache_log,
    read_csv_events,
)

__all__ = ["load_testdata", "read_csv_events", "read_apache_log"]
