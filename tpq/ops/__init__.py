"""L3 operators: filter, joins, aggregate (SURVEY.md §2.1 C6-C9)."""

from tpq.ops.filter import filter_table  # noqa: F401
from tpq.ops.merge_join import merge_join  # noqa: F401
from tpq.ops.hash_aggregate import hash_aggregate  # noqa: F401
from tpq.ops.hash_join import hash_join  # noqa: F401
