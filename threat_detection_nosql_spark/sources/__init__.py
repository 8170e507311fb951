from threat_detection_nosql_spark.sources.readers import (
    load_table,
    load_tables,
    read_activity_csv,
)
from threat_detection_nosql_spark.sources.writers import write_results

__all__ = ["load_table", "load_tables", "read_activity_csv", "write_results"]
