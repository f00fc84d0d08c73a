from geomesa_nifi_spark.lake.evolution import (  # noqa: F401
    CompatibilityMode,
    Reconciliation,
    SchemaCompatibilityError,
    reconcile,
)
from geomesa_nifi_spark.lake.ledger import (  # noqa: F401
    CommitConflict,
    DataFile,
    Ledger,
    Snapshot,
    covered_buckets,
    files_covering,
)
from geomesa_nifi_spark.lake.materialize import (  # noqa: F401
    MaterializeRetentionError,
    create_aggregate_view,
    last_refreshed_version,
    rebuild,
    refresh,
)
from geomesa_nifi_spark.lake.index import (  # noqa: F401
    IndexLookupError,
    create_attr_index,
    index_lookup,
    last_indexed_version,
    refresh_attr_index,
)
from geomesa_nifi_spark.lake.bootstrap import (  # noqa: F401
    bootstrap_hwm,
    bootstrap_load,
    handoff_filter,
)
from geomesa_nifi_spark.lake.inspect import (  # noqa: F401
    files_df,
    orphans_df,
    partitions_df,
    snapshots_df,
)
from geomesa_nifi_spark.lake.merge import (  # noqa: F401
    MergeResult,
    append_only,
    compact,
    delete_where,
    merge_changes,
    migrate_layout,
    rewrite_fids,
    update_by_attribute,
)
from geomesa_nifi_spark.lake.table import BUCKET_COL, LakeTable  # noqa: F401
