"""Time-series operators: expression-tree dynamic programming.

Dynamic Time Warping is the classic "you need a UDF for that" operator:
an O(n·m) DP with sequential dependence in both dimensions. It is
nevertheless expressible entirely in Catalyst higher-order functions —
the outer ``aggregate`` folds over the first series carrying the DP row
as an ``array<double>`` accumulator; the inner ``aggregate`` builds the
next row left-to-right (the in-row sequential dependence lives in the
growing accumulator array). No Python execution, no serialization
boundary: the whole DP runs inside the JVM per row.

Complexity per pair is O(n·m) cells with O(m) array-append per cell
(immutable accumulator), i.e. O(n·m²) — fine for the bounded series
this engine compares (daily/weekly rollups, hundreds of points), and
the row never leaves its executor. For very long series, the right
scale move is PAA downsampling first (coarser grid), not a different
execution engine.

Time-series similarity context: REPOSE (ICDE 2021) and the EDBT 2019
streaming-similarity line both reduce to cheap-prefilter + exact-verify;
``users_activity_similarity`` is the sparse-cosine prefilter shape, and
this DTW is the exact verifier for alignment-tolerant matching.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dtw_distance(xs: str, ys: str) -> Column:
    """DTW distance between two ``array<double>`` columns (by name).

    Standard recurrence with |·| local cost::

        D[0][0] = c(0,0);  D[0][j] = D[0][j-1] + c(0,j)
        D[i][j] = c(i,j) + min(D[i-1][j], D[i][j-1], D[i-1][j-1])

    implemented as a fold over rows of the DP matrix.
    """
    first_row = f"""
        aggregate(
            slice({ys}, 2, size({ys}) - 1),
            array(abs(element_at({xs}, 1) - element_at({ys}, 1))),
            (row, y) -> array_append(
                row, abs(element_at({xs}, 1) - y)
                     + element_at(row, size(row))))
    """
    # inner fold: j tracked as size(row) + 1 (1-based column index)
    next_row = f"""
        (prev, x) -> aggregate(
            sequence(1, size({ys})),
            cast(array() as array<double>),
            (row, j) -> array_append(
                row,
                abs(x - element_at({ys}, j)) + (
                    CASE WHEN j = 1 THEN element_at(prev, 1)
                         ELSE least(
                             element_at(prev, j),
                             element_at(row, j - 1),
                             element_at(prev, j - 1))
                    END)))
    """
    return F.expr(
        f"""
        element_at(
            aggregate(
                slice({xs}, 2, size({xs}) - 1),
                {first_row},
                {next_row}),
            size({ys}))
        """
    )
