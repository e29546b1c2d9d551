"""Vector math over embedding columns as GENERATED SQL text.

The embedding operators originally built their projection expressions out
of pyspark ``Column`` objects with one ``F.lit`` per weight — (k, L)
hyperplane tables at k=16, L=8, dim=64 cost ~25k py4j round-trips (~1 ms
each on this host) of pure plan-BUILD time per query. Everything here is
emitted as ONE SQL string instead: microseconds to build, parsed once
JVM-side.

Two codegen regimes, chosen per use:

- **Projections against literal plane/centroid matrices**
  (``sign_bucket_sql`` / ``msb_bucket_sql`` / ``score_array_sql``): the
  weights are embedded as literal SQL arrays and the dot product stays a
  higher-order ``aggregate(zip_with(...))``. HOFs are interpreted, but a
  corpus row meets each matrix once — the arithmetic is microscopic next
  to shuffle/scan cost. What matters is that the generated class stays
  SMALL: a fully unrolled 16x64 score array emits a ~14k-line class that
  janino refuses, and every failed compile costs seconds per stage
  before the interpreted fallback kicks in (measured: that overhead, not
  the math, dominated these queries).

- **Per-candidate-pair cosine**: r6 measurement REVERSED the r5 choice
  here — the unrolled 64-term straight-line form compiles (janino is
  fine) but exceeds HotSpot's JIT method-size envelope inside join-dense
  pair stages and runs as interpreted bytecode (measured 10x slower
  than the HOF fold on 493k pairs). The pair hot loops therefore use
  ONE HOF dot with the norms hoisted to once-per-vector projections
  (bit-identical: same fold); ``cosine_sql``/``dot_vec_sql`` remain as
  the documented reference forms. Unrolling still wins where the
  per-expression term count is small or split across projection
  columns — see ``dot_lit_sql``'s JIT-envelope note.

Floating-point parity: the HOF forms are the ORIGINAL implementations
verbatim (same fold), and the unrolled cosine sums left-associative in
ascending index order — exactly the HOF fold order — so results are
bit-identical and every DuckDB oracle replica stays valid. Literals
render via ``repr`` (shortest round-trip).

ANSI note: the unrolled forms require uniform ``dim``-length vectors
(``element_at`` past the end raises) — the embedding-table contract; the
HOF forms inherit ``zip_with`` null-padding semantics unchanged.
"""

from __future__ import annotations


def array_lit_sql(weights) -> str:
    """One literal array<double>."""
    return "array(" + ", ".join(repr(float(w)) for w in weights) + ")"


def matrix_lit_sql(rows) -> str:
    """One literal array<array<double>>."""
    return "array(" + ", ".join(array_lit_sql(r) for r in rows) + ")"


def dot_hof_sql(vec: str, weights_sql: str) -> str:
    """aggregate(zip_with(vec, w, x*y), 0.0, +) — the original HOF dot,
    emitted as text (interpreted; use for per-row projections only)."""
    return (
        f"aggregate(zip_with({vec}, {weights_sql}, (x, y) -> x * y), "
        f"0.0d, (a, x) -> a + x)"
    )


def dot_lit_sql(vec: str, weights) -> str:
    """UNROLLED dot of an array column against a LITERAL weight vector:
    ``0.0d + vec[0]*w0 + vec[1]*w1 + ...`` — whole-stage codegen,
    fold-order-identical to ``dot_hof_sql`` (ascending index,
    left-associative), so results are bit-equal to the HOF form.

    JIT envelope (r6, measured): generated straight-line code is FASTER
    than the interpreted HOF only while the containing expression stays
    small enough for HotSpot to JIT — ~4 such dots per expression (256
    terms) won 2.2x, 16 dots as SEPARATE projection columns won 2.4x,
    but 32 dots in ONE expression lost 3x and a 64-term dot inside a
    join-dense pair stage lost 10x. Callers must keep each expression's
    term count small (see msb_bucket_sql's cutoff) or split into
    separate columns (similarity._scored_columns)."""
    terms = " + ".join(
        f"{vec}[{i}] * {repr(float(w))}d" for i, w in enumerate(weights)
    )
    return f"(0.0d + {terms})"


_UNROLL_MAX_TERMS = 512


def sign_bucket_sql(vec: str, planes) -> str:
    """Pack sign bits of the planes' projections, bit i = plane i
    (out |= (proj_i > 0) << i); bigint-typed."""
    terms = [
        f"shiftleft(CAST({dot_hof_sql(vec, array_lit_sql(p))} > 0.0d AS BIGINT), {i})"
        for i, p in enumerate(planes)
    ]
    return "(" + " | ".join(terms) + ")"


def msb_bucket_sql(vec: str, planes) -> str:
    """similarity.lsh_topk packing: out = out*2 + bit, plane 0 is the
    HIGH bit; int-typed (matches the hamming-probe xor arithmetic).

    r6: the projections unroll to literal dots (whole-stage codegen,
    bit-identical fold) while the total term count stays inside the JIT
    envelope — measured 1.46s -> 0.65s on the 20k-row cosine_topk_lsh
    corpus at 4 planes; larger plane sets keep the HOF form (a 32x64
    unrolled expression measured 3x SLOWER once HotSpot stops JITing
    the generated method)."""
    n_terms = len(planes) * (len(planes[0]) if planes else 0)
    out = "0"
    for p in planes:
        if n_terms <= _UNROLL_MAX_TERMS:
            dot = dot_lit_sql(vec, p)
        else:
            dot = dot_hof_sql(vec, array_lit_sql(p))
        bit = f"CAST({dot} > 0.0d AS INT)"
        out = f"({out} * 2 + {bit})"
    return out


def score_array_sql(vec: str, centroids) -> str:
    """array(dot(vec, c) for c in centroids) — one transform over a
    literal matrix; the IVF scoring array."""
    return (
        f"transform({matrix_lit_sql(centroids)}, "
        f"__c -> {dot_hof_sql(vec, '__c')})"
    )


def cosine_hof_sql(a: str, b: str) -> str:
    """HOF cosine (interpreted, dim-agnostic, codegen-tiny) — use where
    the surrounding stage is already expression-heavy (e.g. fused with
    the bucket-pair expansion): measured equal to the unrolled form there
    because pair EXPANSION dominates, and it can never trip the janino
    method-size limit."""
    return (
        f"(aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0d, (p, q) -> p + q) / "
        f"(sqrt(aggregate({a}, 0.0d, (p, q) -> p + q * q)) * "
        f"sqrt(aggregate({b}, 0.0d, (p, q) -> p + q * q))))"
    )


def sq_norm_hof_sql(a: str) -> str:
    """The HOF squared norm — the EXACT subexpression ``cosine_hof_sql``
    evaluates per side, exposed so callers can hoist it to a once-per-row
    projection (sqrt of this times sqrt of the other side's == the HOF
    cosine's denominator bit-for-bit)."""
    return f"aggregate({a}, 0.0d, (p, q) -> p + q * q)"


def checked_vec_sql(v: str, dim: int) -> str:
    """Fail-loud dimension guard as a ONCE-PER-ROW projection (r6, VERDICT
    r5 #2b): validates size(v) == dim on the vector row BEFORE any join /
    pair expansion, so the per-pair hot loop can run the unchecked
    unrolled cosine. Same failure surface as the per-pair CASE it
    replaces (every vector that would have reached a pair is checked;
    the raise message keeps the 'dim mismatch' contract)."""
    return (
        f"(CASE WHEN size({v}) = {dim} THEN {v} "
        f"ELSE raise_error(concat('vecexpr dim mismatch: expected {dim}, got "
        f"size ', size({v}))) END)"
    )


def dot_vec_sql(a: str, b: str, dim: int) -> str:
    """Unrolled sum_i a[i]*b[i], fold-order-identical to the HOF dot."""
    terms = " + ".join(
        f"element_at({a}, {i + 1}) * element_at({b}, {i + 1})"
        for i in range(dim)
    )
    return f"(0.0d + {terms})"


def sq_norm_sql(a: str, dim: int) -> str:
    terms = " + ".join(
        f"element_at({a}, {i + 1}) * element_at({a}, {i + 1})"
        for i in range(dim)
    )
    return f"(0.0d + {terms})"


def cosine_sql(a: str, b: str, dim: int) -> str:
    """Exact cosine, same operation tree as ``dedup.cosine_expr``
    (dot / (sqrt(na) * sqrt(nb))); unrolled — the per-candidate-pair
    hot path."""
    return (
        f"({dot_vec_sql(a, b, dim)} / "
        f"(sqrt({sq_norm_sql(a, dim)}) * sqrt({sq_norm_sql(b, dim)})))"
    )


def cosine_checked_sql(a: str, b: str, dim: int) -> str:
    """``cosine_sql`` with a fail-loud dimension guard (ADVICE r4): the
    unrolled form indexes element_at(v, 1..dim), and in non-ANSI mode an
    out-of-range index yields NULL — a caller whose vectors are shorter
    than ``dim`` would silently score every pair NULL and get an
    empty/wrong top-k. The guard costs two size() calls per pair and
    raises with the observed sizes instead."""
    return (
        f"(CASE WHEN size({a}) = {dim} AND size({b}) = {dim} "
        f"THEN {cosine_sql(a, b, dim)} "
        f"ELSE raise_error(concat('vecexpr dim mismatch: expected {dim}, got "
        f"sizes ', size({a}), ' and ', size({b}))) END)"
    )
