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
)
from geomesa_nifi_spark.lake.merge import MergeResult, append_only, merge_changes  # noqa: F401
from geomesa_nifi_spark.lake.table import BUCKET_COL, LakeTable  # noqa: F401
