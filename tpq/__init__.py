"""tpq — a TPU-native vectorized query-execution engine.

Built from scratch against the capability set of dryman/HashMergeJoin
(reference mount empty — spec is /root/repo/BASELINE.json; see SURVEY.md §0):
hash join (robin-hood build/probe), sort-merge join (radix sort), hash
aggregate, filter, over columnar SoA batches, with distributed shuffle
exchange across a TPU mesh.

Layering (SURVEY.md §1.2):
  L1 columnar   — tpq.columnar
  L2 kernels    — tpq.kernels.*
  L3 operators  — tpq.ops.*
  L4 distributed— tpq.dist.*
  L5 query      — tpq.query
  L6 bench      — tpq.bench.*

int64 keys are first-class: we enable jax_enable_x64 at import. Hot kernels
hash/compare in 2xu32 lanes internally (SURVEY.md §7.4.4); i64 only at
boundaries.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)
# TPU compiles are expensive on this stack (~53 s cold, SURVEY.md §7.1);
# a persistent cache makes every later process warm-start.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tpq_jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpq.columnar import Table  # noqa: E402,F401

__version__ = "0.1.0"
