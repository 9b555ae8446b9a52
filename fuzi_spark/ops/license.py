"""License detection for code/document corpora (The Stack recipe).

Open-code pretraining sets (The Stack, StarCoder data) gate inclusion
on a detected license: an explicit SPDX identifier when present, else
matching the distinctive phrases of the common license families in the
document header. This module is that gate as ONE codegen'd projection —
a scan-speed predicate stack, the same shape as textstats.quality_filter:

- `SPDX-License-Identifier: <id>` wins outright (it is the machine-
  readable declaration; ScanCode and licensee treat it the same way);
- else the HEADER WINDOW (first `header_chars` of the doc, lowercased,
  whitespace collapsed so wrapped license text matches) is probed for
  one distinctive phrase per family, in a fixed priority order — each
  phrase is the opening line every template of that family shares
  (e.g. MIT's "permission is hereby granted, free of charge", BSD's
  "redistribution and use in source and binary forms"). LGPL probes
  before GPL because the GPL phrase is a substring of the LGPL one;
  GPL resolves its version from the "either version N" clause within
  200 chars of the family phrase.

Detection is header-anchored ON PURPOSE: license declarations live at
the top of files and README/LICENSE docs, and bounding the probe keeps
the match cost independent of document length at 10^12 docs.

`permissive` follows the Blue Oak / The Stack convention: MIT, Apache,
BSD, MPL, Unlicense, and CC-BY count as permissive; GPL/LGPL/AGPL as
copyleft; no detection → NULL (absence of evidence, callers decide —
The Stack's default is to EXCLUDE undetected files, which is
`filter(col("license_family").isNotNull())` here).

Reference parity note: the reference (kylehughes/Fuzi) has no license
surface — pipeline-brief scope (training-data curation for code
corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (family, distinctive phrase, permissive) — probe order IS precedence
_FAMILIES = [
    ("MIT", "permission is hereby granted, free of charge", 1),
    ("Apache-2.0", "apache license, version 2.0", 1),
    ("BSD", "redistribution and use in source and binary forms", 1),
    ("MPL-2.0", "mozilla public license", 1),
    ("Unlicense", "free and unencumbered software released into the public domain", 1),
    ("CC-BY", "creative commons attribution", 1),
    ("AGPL-3.0", "gnu affero general public license", 0),
    ("LGPL", "gnu lesser general public license", 0),
    ("GPL", "gnu general public license", 0),
]

_PERMISSIVE = {f: p for f, _, p in _FAMILIES}
_PERMISSIVE.update({"GPL-2.0": 0, "GPL-3.0": 0})

_SPDX_RE = r"SPDX-License-Identifier:\s*([A-Za-z0-9.+-]+)"


def detect_license(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    header_chars: int = 4000,
) -> DataFrame:
    """One row per input doc: (id_col, spdx_id, license_family,
    permissive:int). spdx_id is the raw SPDX identifier when declared
    (and license_family echoes it verbatim); else license_family is the
    first matching family in the fixed probe order, with GPL refined to
    GPL-2.0/GPL-3.0 by the "either version N" clause. permissive is
    1/0 per family, NULL when nothing matched."""
    hdr = F.regexp_replace(
        F.lower(F.substring(F.col(text_col), 1, int(header_chars))),
        r"\s+",
        " ",
    )
    spdx = F.regexp_extract(
        F.substring(F.col(text_col), 1, int(header_chars)), _SPDX_RE, 1
    )
    spdx = F.when(spdx != "", spdx)

    family = F.lit(None).cast("string")
    # build the precedence chain back-to-front so earlier families win
    for fam, phrase, _p in reversed(_FAMILIES):
        hit = hdr.contains(F.lit(phrase))
        if fam == "GPL":
            ver = F.regexp_extract(
                hdr, r"gnu general public license.{0,200}?version ([23])", 1
            )
            fam_val = (
                F.when(ver == "2", "GPL-2.0")
                .when(ver == "3", "GPL-3.0")
                .otherwise("GPL")
            )
        else:
            fam_val = F.lit(fam)
        family = F.when(hit, fam_val).otherwise(family)
    family = F.coalesce(spdx, family)

    perm = F.create_map(
        *[F.lit(x) for kv in _PERMISSIVE.items() for x in kv]
    )[family].cast("int")
    return docs.select(
        F.col(id_col),
        spdx.alias("spdx_id"),
        family.alias("license_family"),
        perm.alias("permissive"),
    )
