"""LLM training-data pipeline operators (SURVEY §2.10, north star).

Not in the reference (its README is one line) — these are the scale
extensions BASELINE.json requires: dedup (exact / MinHash-LSH / SimHash),
similarity search over embeddings, and text analysis, all designed
partition-parallel for 100 TB:

- no O(n²) cross joins: candidate generation is LSH *banding* — equal
  band-hash ⇒ same shuffle bucket ⇒ pairs enumerated per bucket only;
- Python kernels are Arrow-vectorized pandas_udfs with fixed seeds
  (bit-reproducible across runs and engines where applicable);
- only the tiny query set of the kNN is ever driver-resident (it is the
  broadcast side); the corpus side streams through mapInPandas.
"""

# r13: operators/llm.py (4.9k lines) became this package. Import order
# is dependency order (text -> lsh -> dedup; knn/corpus independent).
# Every module-level name — including the underscore-prefixed kernels
# and knobs the test suite reaches for — is re-exported so existing
# ``from ...operators.llm import X`` and ``operators.llm.X`` paths keep
# resolving; @register side effects run exactly once, at first import.

from . import text as _text  # noqa: E402
from . import lsh as _lsh  # noqa: E402
from . import dedup as _dedup  # noqa: E402
from . import knn as _knn  # noqa: E402
from . import corpus as _corpus  # noqa: E402

for _m in (_text, _lsh, _dedup, _knn, _corpus):
    globals().update(
        {k: v for k, v in vars(_m).items() if not k.startswith("__")}
    )
del _m
