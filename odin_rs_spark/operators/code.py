"""Code-corpus governance operators: license detection and secret
scanning — the two gates every public-code training build runs before
a file is allowed into the corpus (The-Stack/StarCoder-style builds
keep only permissively-licensed files and scrub credentials; BigCode's
data-governance plan documents both steps).

Everything here is pure column math — JVM regexps and higher-order
functions, zero Python in the plan — so each rule replays verbatim in
the DuckDB oracle and runs in whole-stage codegen at corpus scale.
Reference parity: the reference engine has no code-governance surface;
these extend the corpus-prep family (SURVEY.md §2 beyond-reference
training-data ops) alongside operators/text.code_line_stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# License detection (SPDX short-form ids + classic header phrases)
# --------------------------------------------------------------------------

# SPDX short-form tag (SPDX spec Annex E): the machine-readable line
# modern files carry.  One id token is captured; expression operators
# (OR/AND/WITH) keep only the first operand — the conservative gate.
SPDX_RE = r"SPDX-License-Identifier:[ \t]*([0-9A-Za-z.+-]+)"

# Classic license-header phrases, matched case-insensitively against
# the file HEAD only (headers live at the top; a license mentioned in
# body prose is not a grant).  First match wins, most-specific first.
# Patterns are RE2-safe (no backreferences/lookaround) so the DuckDB
# oracle replays them byte-identically.
LICENSE_PHRASES: tuple[tuple[str, str], ...] = (
    ("Apache-2.0", r"(?is)licensed under the apache license,? version 2\.0"),
    ("MIT", r"(?is)permission is hereby granted, free of charge"),
    ("BSD-3-Clause", r"(?is)redistribution and use in source and binary forms"),
    ("AGPL-3.0-only", r"(?is)gnu affero general public license"),
    ("LGPL-2.1-only", r"(?is)gnu lesser general public license"),
    ("GPL-3.0-only", r"(?is)gnu general public license.{0,200}version 3"),
    ("GPL-2.0-only", r"(?is)gnu general public license.{0,200}version 2"),
    ("MPL-2.0", r"(?is)mozilla public license,? v(?:ersion)? ?2\.0"),
    ("Unlicense", r"(?is)this is free and unencumbered software"),
)

# SPDX-id prefix → governance category.  'permissive' is the keep-set
# of The-Stack-style builds; copyleft files are routed out (or to a
# separate opt-in corpus); unknown ids are quarantined, and files with
# no grant at all default to all-rights-reserved ('none').
_CAT_RULES: tuple[tuple[str, str], ...] = (
    (r"(?i)^(agpl|gpl)", "copyleft"),
    (r"(?i)^(lgpl|mpl|epl|cddl)", "weak-copyleft"),
    (
        r"(?i)^(mit|apache|bsd|isc|unlicense|zlib|cc0|0bsd|x11|wtfpl)",
        "permissive",
    ),
)


def license_category(license_id: Column) -> Column:
    """Map an SPDX-ish id to permissive / weak-copyleft / copyleft /
    unknown; NULL (no grant found) maps to 'none'."""
    out = F.lit("unknown")
    for pat, cat in reversed(_CAT_RULES):
        out = F.when(license_id.rlike(pat), F.lit(cat)).otherwise(out)
    return F.when(license_id.isNull(), F.lit("none")).otherwise(out)


def license_detect(
    df: DataFrame, text_col: str = "text", head_chars: int = 1500
) -> DataFrame:
    """Per-document license identification: an SPDX short-form tag
    anywhere in the file wins (machine-readable intent), else the
    first classic header phrase found in the first ``head_chars``
    characters.  Adds ``license_id`` (NULL when nothing matched),
    ``license_via`` ('spdx' | 'phrase' | NULL) and ``license_cat``.

    Scale shape: per-row regexps over a bounded head — zero shuffle,
    zero Python, whole-stage codegen; the corpus never moves."""
    text = F.col(text_col)
    spdx = F.regexp_extract(text, SPDX_RE, 1)
    head = F.substring(text, 1, head_chars)
    phrase = F.lit(None).cast("string")
    for lic, pat in reversed(LICENSE_PHRASES):
        phrase = F.when(head.rlike(pat), F.lit(lic)).otherwise(phrase)
    license_id = F.when(spdx != "", spdx).otherwise(phrase)
    via = (
        F.when(spdx != "", F.lit("spdx"))
        .when(phrase.isNotNull(), F.lit("phrase"))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        "*",
        license_id.alias("license_id"),
        via.alias("license_via"),
        license_category(license_id).alias("license_cat"),
    )


# --------------------------------------------------------------------------
# Secret scanning (credentials in code — the scrub-before-train gate)
# --------------------------------------------------------------------------

# AWS access-key id: fixed 'AKIA' prefix + 16 uppercase base-32 chars
# (public AWS docs); the canonical "did someone commit a credential"
# pattern every scanner ships.
AWS_KEY_RE = r"\bAKIA[0-9A-Z]{16}\b"

# PEM private-key preamble (RFC 7468 §2 encapsulation boundary): the
# label varies (RSA/EC/OPENSSH/…) but always ends 'PRIVATE KEY'.
PEM_RE = r"-----BEGIN [A-Z ]{0,20}PRIVATE KEY-----"

# Quoted value assigned to a credential-ish name.  The value (group 1)
# is a candidate, confirmed only if its character entropy clears the
# truffleHog-style threshold — 'password = "changeme"' is a candidate
# but not a finding.
SECRET_ASSIGN_RE = (
    r"(?i)(?:api_key|apikey|api_token|secret|token|passwd|password)"
    r"['\"]?[ \t]*[:=][ \t]*['\"]([0-9A-Za-z/+_=-]{16,64})['\"]"
)

# Shannon-entropy gate for candidate values, in bits/char.  Hex-ish
# random material sits near 3.7-4.0; words and repeated chars sit
# well under 3.  Fixtures keep candidates far from the boundary so the
# float compare can never flip between engines.
SECRET_ENTROPY_BITS = 3.5


def _string_entropy_bits(s: Column) -> Column:
    """Shannon entropy (bits/char) of one string value — the q156
    char_entropy formula applied inside a higher-order lambda so an
    ARRAY of candidate strings can be gated without exploding rows."""
    cs = F.filter(F.split(s, ""), lambda x: x != "")
    n = F.size(cs)
    counts = F.transform(
        F.array_distinct(cs), lambda ch: F.size(F.filter(cs, lambda x: x == ch))
    )
    snn = F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, k: acc + k.cast("double") * F.log(k.cast("double")),
    )
    return (F.log(n.cast("double")) - snn / n.cast("double")) / F.log(F.lit(2.0))


def secret_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document credential audit: counts AWS access-key ids, PEM
    private-key blocks, quoted credential assignments (candidates) and
    the high-entropy subset of those candidates (findings), plus a
    ``secret_flag`` any-finding bit.

    Scale shape: regexp extraction + in-row higher-order entropy —
    zero shuffle, zero Python; candidate lists are tiny (bounded by
    matches per file) so the nested HOF cost is O(matches·len)."""
    text = F.col(text_col)
    n_aws = F.size(F.regexp_extract_all(text, F.lit(AWS_KEY_RE), F.lit(0)))
    n_pem = F.size(F.regexp_extract_all(text, F.lit(PEM_RE), F.lit(0)))
    cands = F.regexp_extract_all(text, F.lit(SECRET_ASSIGN_RE), F.lit(1))
    n_cand = F.size(cands)
    n_hot = F.size(
        F.filter(
            cands, lambda c: _string_entropy_bits(c) >= F.lit(SECRET_ENTROPY_BITS)
        )
    )
    return df.select(
        "*",
        n_aws.alias("n_aws_keys"),
        n_pem.alias("n_pem_keys"),
        n_cand.alias("n_secret_candidates"),
        n_hot.alias("n_secret_values"),
        ((n_aws + n_pem + n_hot) > 0).alias("secret_flag"),
    )


def redact_secrets(text: Column | str) -> Column:
    """Replace each secret match with a '[SECRET]' token (full-match
    replacement — group-reference syntax differs between regex engines
    so the whole assignment is redacted, the conservative choice)."""
    c = F.col(text) if isinstance(text, str) else text
    for pat in (AWS_KEY_RE, PEM_RE, SECRET_ASSIGN_RE):
        c = F.regexp_replace(c, pat, "[SECRET]")
    return c
