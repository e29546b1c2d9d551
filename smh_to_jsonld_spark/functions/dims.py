"""Broadcast dimension dictionaries.

The reference keeps these as driver-side Python dicts
(/root/reference/utils/location.py:2-16,54-70 STATE_FIPS/STATE_ABBR;
/root/reference/pipeline/jsonld_to_html.py:56-80 license map). Here they
are one compact public-domain FIPS table (US Census / ANSI codes) exposed
three ways:

- ``fips_rows()``            -> list of (fips, abbr, name) tuples
- ``state_dim(spark)``       -> tiny DataFrame for ``F.broadcast`` joins
- ``fips_to_name_map()`` etc -> plain dicts for pandas-UDF closures

At scale the dict NEVER travels row-at-a-time: it is either a broadcast
join dimension or captured in an Arrow-batched UDF closure.
"""

from __future__ import annotations

from functools import lru_cache

# fips:abbr:name — public-domain ANSI/FIPS state codes (+ US aggregate).
_FIPS_TABLE = """\
01:AL:Alabama
02:AK:Alaska
04:AZ:Arizona
05:AR:Arkansas
06:CA:California
08:CO:Colorado
09:CT:Connecticut
10:DE:Delaware
11:DC:District of Columbia
12:FL:Florida
13:GA:Georgia
15:HI:Hawaii
16:ID:Idaho
17:IL:Illinois
18:IN:Indiana
19:IA:Iowa
20:KS:Kansas
21:KY:Kentucky
22:LA:Louisiana
23:ME:Maine
24:MD:Maryland
25:MA:Massachusetts
26:MI:Michigan
27:MN:Minnesota
28:MS:Mississippi
29:MO:Missouri
30:MT:Montana
31:NE:Nebraska
32:NV:Nevada
33:NH:New Hampshire
34:NJ:New Jersey
35:NM:New Mexico
36:NY:New York
37:NC:North Carolina
38:ND:North Dakota
39:OH:Ohio
40:OK:Oklahoma
41:OR:Oregon
42:PA:Pennsylvania
44:RI:Rhode Island
45:SC:South Carolina
46:SD:South Dakota
47:TN:Tennessee
48:TX:Texas
49:UT:Utah
50:VT:Vermont
51:VA:Virginia
53:WA:Washington
54:WV:West Virginia
55:WI:Wisconsin
56:WY:Wyoming
60:AS:American Samoa
66:GU:Guam
69:MP:Northern Mariana Islands
72:PR:Puerto Rico
78:VI:Virgin Islands
US:US:United States
"""

# Sentinel strings the reference treats as "missing"
# (/root/reference/utils/jsonld.py:145).
MISSING_SENTINELS = ("NA", "na", "TBD", "N/A", "NaN")


@lru_cache(maxsize=1)
def fips_rows() -> tuple:
    rows = []
    for line in _FIPS_TABLE.strip().splitlines():
        fips, abbr, name = line.split(":")
        rows.append((fips, abbr, name))
    return tuple(rows)


@lru_cache(maxsize=1)
def fips_to_name_map() -> dict:
    return {f: n for f, _, n in fips_rows()}


@lru_cache(maxsize=1)
def name_to_abbr_map() -> dict:
    return {n: a for _, a, n in fips_rows()}


@lru_cache(maxsize=1)
def name_to_fips_map() -> dict:
    return {n: f for f, _, n in fips_rows()}


def state_dim(spark):
    """57-row location dimension as a DataFrame (broadcast-join side)."""
    return spark.createDataFrame(
        list(fips_rows()), schema="fips string, abbr string, state_name string"
    )


def alias_dim(spark):
    """Entity-linking alias dictionary: alias -> canonical FIPS.

    Generalization of the reference's lookup dicts into the broadcast
    alias dictionary (SURVEY.md §1.1): full name, abbreviation and raw
    FIPS code all resolve to the canonical code.
    """
    rows = []
    for fips, abbr, name in fips_rows():
        rows.append((name.lower(), fips, "location"))
        rows.append((abbr.lower(), fips, "location"))
        rows.append((fips.lower(), fips, "location"))
    # dedupe alias collisions (e.g. US:US:United States)
    seen, out = set(), []
    for alias, canon, typ in rows:
        if alias not in seen:
            seen.add(alias)
            out.append((alias, canon, typ))
    return spark.createDataFrame(out, schema="alias string, canonical string, entity_type string")


# ---------------------------------------------------------------------------
# J3 — license -> URL map (jsonld_to_html.py:56-80): exact match on the
# UPPER-cased license string; misses render the bare license name.
# ---------------------------------------------------------------------------
LICENSE_URLS = {
    # Open Source / Software
    "MIT": "https://opensource.org/license/mit/",
    "GPL-3.0": "https://www.gnu.org/licenses/gpl-3.0.en.html",
    "APACHE-2.0": "https://www.apache.org/licenses/LICENSE-2.0",
    "BSD SIMPLIFIED": "https://opensource.org/license/bsd-2-clause",
    # Creative Commons
    "CC0-1.0": "https://creativecommons.org/publicdomain/zero/1.0/",
    "CC-BY-4.0": "https://creativecommons.org/licenses/by/4.0/",
    "CC-BY-NC-4.0": "https://creativecommons.org/licenses/by-nc/4.0/",
    "CC BY-NC 4.0": "https://creativecommons.org/licenses/by-nc/4.0/",  # spacing variant
    "CC-BY-SA-4.0": "https://creativecommons.org/licenses/by-sa/4.0/",
    "CC-BY_SA-4.0": "https://creativecommons.org/licenses/by-sa/4.0/",  # legacy underscore
    # Open Data Commons
    "ODC-BY": "https://opendatacommons.org/licenses/by/",
    "ODBL": "https://opendatacommons.org/licenses/odbl/",
    "PDDL": "https://opendatacommons.org/licenses/pddl/",
    # Government / Other
    "OGL-3.0": "https://www.nationalarchives.gov.uk/doc/open-government-licence/version/3/",
}


def license_url(col):
    """Column: license string -> URL via a map-literal lookup (NULL on
    miss, so callers can coalesce to the bare name)."""
    from itertools import chain

    from pyspark.sql import functions as F

    m = F.create_map(*[F.lit(x) for x in chain.from_iterable(LICENSE_URLS.items())])
    return m[F.upper(col)]
