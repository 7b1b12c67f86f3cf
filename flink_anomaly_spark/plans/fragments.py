"""Shared DuckDB oracle SQL fragments.

These mirror engine-side expressions exactly (see operators/dedup.py
md5_int32/md5_long and operators/dedup.shingles) — keep each in ONE
place so the Spark and oracle forms can't drift apart.
"""

#: whitespace tokens of the `text` column, empties removed
TOKS = r"list_filter(string_split_regex(text, '\s+'), tk -> tk != '')"

#: first 8 md5 hex chars as BIGINT in [0, 2^32) — mirrors dedup.md5_int32
MD5_32 = "CAST(('0x' || substr(md5({x}),1,8)) AS BIGINT)"

#: first 15 md5 hex chars as BIGINT (60 bits) — mirrors dedup.md5_long
MD5_60 = "CAST(('0x' || substr(md5({x}),1,15)) AS BIGINT)"


def shingle_sql(k: int) -> str:
    """DuckDB k-shingles over a `toks` list column (mirrors dedup.shingles)."""
    return f"""
    CASE WHEN len(toks) >= {k}
         THEN list_transform(range(1, len(toks)-{k}+2),
                             i -> array_to_string(toks[i:i+{k - 1}], ' '))
         ELSE [array_to_string(toks, ' ')] END
    """


def gram_hash_horner(s: str, i: str, k: int, base: int = 257, mod: int = 1_000_000_007) -> str:
    """Polynomial (Rabin-Karp-family) hash of the ``k``-char gram of
    string expression ``s`` starting at 1-based index expression ``i``,
    as a Horner chain: ``h = ((h*B + c) % M)`` per character.

    The emitted SQL uses only ``ascii``/``substr``/``*``/``+``/``%`` —
    identical syntax AND semantics in Spark SQL and DuckDB (verified
    bit-for-bit), so the engine and the oracle share this one
    generator and cannot drift. The seed is CAST to BIGINT so every
    multiply-add runs in 64-bit in BOTH engines (ascii() alone returns
    int32, and ``h*B`` exceeds int32 range); ``M*B + 127 << 2^63`` so
    the BIGINT arithmetic never overflows.
    """
    e = f"CAST(ascii(substr({s}, {i}+0, 1)) AS BIGINT)"
    for j in range(1, k):
        e = f"(({e})*{base} + ascii(substr({s}, {i}+{j}, 1))) % {mod}"
    return e


def hilbert_steps(bits: int) -> tuple[list[tuple[str, str]], str]:
    """Unrolled Hilbert xy2d transform over two ``bits``-bit bucket
    columns named ``hx0``/``hy0`` — ONE generator for both engines
    (pure ``%``/``>=``/``CASE`` arithmetic, identical syntax and
    semantics in Spark SQL and DuckDB), so the engine expression and
    the oracle cannot drift.

    Returns ``(steps, d_expr)``: per-level column definitions
    [(name, sql), ...] to apply in order, and the final distance
    expression. The quadrant flip uses ``n-1-coord`` (a valid
    Hilbert-family rotation, verified bijective with unit curve
    adjacency in tests) because it keeps every intermediate coordinate
    in [0, n) — the ``s-1`` textbook flip goes negative, where SQL's
    truncating ``%`` and Python's floor ``%`` diverge.
    """
    n = 2**bits
    steps: list[tuple[str, str]] = []
    d_terms: list[str] = []
    for i, s in enumerate(2**b for b in range(bits - 1, -1, -1)):
        x, y = f"hx{i}", f"hy{i}"
        rx = f"(CASE WHEN {x} % {2 * s} >= {s} THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN {y} % {2 * s} >= {s} THEN 1 ELSE 0 END)"
        steps.append((f"rx{i}", rx))
        steps.append((f"ry{i}", ry))
        d_terms.append(
            f"{s * s} * (CASE WHEN rx{i} = 0 AND ry{i} = 0 THEN 0 "
            f"WHEN rx{i} = 0 THEN 1 WHEN ry{i} = 1 THEN 2 ELSE 3 END)"
        )
        if i < bits - 1:
            steps.append((
                f"hx{i + 1}",
                f"(CASE WHEN ry{i} = 1 THEN {x} WHEN rx{i} = 0 THEN {y} "
                f"ELSE {n - 1} - {y} END)",
            ))
            steps.append((
                f"hy{i + 1}",
                f"(CASE WHEN ry{i} = 1 THEN {y} WHEN rx{i} = 0 THEN {x} "
                f"ELSE {n - 1} - {x} END)",
            ))
    return steps, " + ".join(d_terms)
