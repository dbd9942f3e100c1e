"""Pattern-bank parity tests.

Corpora and assertions ported from the reference's own unit suite
(``/root/reference/pdf2doi/test_patterns.py:8-69``) against our vendored
pattern module — this pins the regex bank and standardisation rule to
byte-identical behavior, including the tier-ordering semantics.
"""
import re

import pytest

from pdf2doi_spark.core.patterns import (
    DOI_TIERS,
    doi_regexp,
    standardise_doi,
)

BASIC_DOIS = [
    "10.1006/jmrb.1993.1004",
    "10.1068/p080244",
    "10.2307/357448",
    "10.1002/cber.19260590832",
    "10.1016/0141-4607(85)90047-2",
    "10.1016/j.gaitpost.2009.07.035",
    "10.1109/sibgrapi.2012.5",
    "10.1111/j.1532-5415.2012.04014.x",
    "10.2307/3950104",
    "10.1002/esp.3322",
]

DOIS_WITH_NON_STANDARD_SEPARTORS = (
    [doi.replace("/", ":") for doi in BASIC_DOIS]
    + [doi.replace("/", " ") for doi in BASIC_DOIS]
    + [f"[{doi.replace('/', ']')}" for doi in BASIC_DOIS]
)

# Short / dotted namespaces (reference test_patterns.py:30-34).
DOIS_WITH_SHORT_NAMESPACES = [
    "10.2.337/dc08-2337",
    "10.58.12/numonthly.14189",
    "10.16/j.reuma.2008.12.011",
]

# Documented-unsupported forms (reference test_patterns.py:36-42) — pinned
# as NOT fully standardisable so that a future "fix" can't silently change
# extraction results.
STRANGE_BUT_VALID_DOIS = [
    "10.1642/0004-8038(2005)122[0121:POTPIS]2.0.CO;2",
    "10.1002/1521-4141(200106)31:6<1685::aid-immu1685>3.0.co;2-v",
    "10.1676/0043-5643(2002)114[0197:rbacib]2.0.co;2",
    "10.1061/(asce)0733-9429(2008)134:4(390)",
]


@pytest.mark.parametrize(
    ["suspected", "expected"],
    [
        ["10.1177:0146167297234003", "10.1177/0146167297234003"],
        ["10.1109/CVPR.2016.90.", "10.1109/cvpr.2016.90"],
        *zip(DOIS_WITH_NON_STANDARD_SEPARTORS, BASIC_DOIS + BASIC_DOIS + BASIC_DOIS),
    ],
)
def test_standardise_doi(suspected, expected):
    assert standardise_doi(suspected) == expected


@pytest.mark.parametrize(
    ["suspected", "expected"],
    [
        *zip(BASIC_DOIS, BASIC_DOIS),
        ["10.1109/sp.2011.40"] * 2,
        ["doi10.1177:0146167297234003", "10.1177/0146167297234003"],
        ["10.1177:0146167297234003.pdf", "10.1177/0146167297234003.pdf"],
        [
            "https://journals.sagepub.com/doi/pdf/10.1177/0146167297234003",
            "10.1177/0146167297234003",
        ],
        ["https://doi.org/10.1109/sp.2011.40", "10.1109/sp.2011.40"],
    ],
)
def test_is_loose_doi_match(suspected, expected):
    # Walk the tier bank strict→loose; the FIRST tier with any candidate
    # must standardise to the expected DOI (pins tier ordering, not just
    # the individual regexes).
    for regex in doi_regexp:
        identifiers = re.findall(regex, suspected.lower())
        if identifiers:
            assert standardise_doi(identifiers[0]) == expected
            return
    assert False, f"no tier matched {suspected!r}"


def test_multi_doi_last_match_wins_in_standardise():
    # Verified reference quirk (SURVEY.md F2): with two DOIs in one string,
    # standardise_doi returns the LAST match's groups.
    s = "10.1063/1.2409490 and 10.1038/s41586-019-1666-5"
    assert standardise_doi(s) == "10.1038/s41586-019-1666-5"


def test_trailing_dot_stripped():
    assert standardise_doi("10.1109/CVPR.2016.90.") == "10.1109/cvpr.2016.90"


def test_compiled_tiers_match_raw_bank():
    assert len(DOI_TIERS) == len(doi_regexp) == 5
    for compiled, raw in zip(DOI_TIERS, doi_regexp):
        assert compiled.pattern == raw


def test_strange_dois_not_roundtripped():
    # These forms are documented-unsupported in the reference; they must not
    # standardise to themselves (charset excludes [ ] < > ; uppercase ...).
    for doi in STRANGE_BUT_VALID_DOIS:
        assert standardise_doi(doi) != doi
