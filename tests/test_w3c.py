"""W3C JSON-LD 1.1 conformance (the reference's correctness baseline —
SURVEY.md §5). Pass-count floors are the measured current state; any
regression below them fails CI."""

import pytest

from tests.w3c_support import suite_available
from tests.run_w3c import run_suite

pytestmark = pytest.mark.skipif(
    not suite_available(), reason="vendored W3C suite not present"
)


def test_w3c_expand():
    passed, failed, skipped = run_suite("expand")
    assert failed == 0
    assert passed >= 376


def test_w3c_flatten():
    passed, failed, skipped = run_suite("flatten")
    assert passed >= 54
    assert failed <= 1  # #t0044 requires compaction (pending module)


def test_w3c_tordf():
    passed, failed, skipped = run_suite("toRdf")
    assert failed == 0
    assert passed >= 455
