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
