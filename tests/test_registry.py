"""Driver-window registry invariants (no Spark session needed).

The driver's CORRECTNESS gate checks only the FIRST 50 registered queries;
``queries._DEFERRED`` pins which queries ride in the overflow tail. These
invariants used to live only in comments — encoding them as tests is what
prevents the r04 bug (two deferred queries citing each other as their
in-window sibling, leaving an operator family with zero driver evidence).
"""

from warcbase_spark.queries import ORACLES, QUERIES, _DEFERRED

WINDOW = 50


def test_every_deferred_query_exists():
    for name in _DEFERRED:
        assert name in QUERIES, f"deferred query {name!r} is not registered"


def test_sibling_invariant_no_circular_deferrals():
    """Each deferral's named sibling must be a registered query that is
    NOT itself deferred — i.e. the sibling actually rides inside the
    driver window this round."""
    for name, sibling in _DEFERRED.items():
        assert sibling in QUERIES, f"{name}: sibling {sibling!r} not registered"
        assert sibling not in _DEFERRED, (
            f"{name}: sibling {sibling!r} is itself deferred — circular "
            "deferral leaves the operator family without driver evidence"
        )


def test_window_is_exactly_full():
    """The in-window set must fill the driver's 50-query gate exactly:
    fewer wastes driver evidence capacity, more silently pushes the tail
    of the registration order out of the gate."""
    in_window = [n for n in QUERIES if n not in _DEFERRED]
    assert len(in_window) == WINDOW, (
        f"{len(in_window)} queries in-window, expected {WINDOW}; "
        "adjust _DEFERRED when registering new queries"
    )
    # and the deferred names must be EXACTLY the registration-order tail
    # (``_apply_driver_window_order`` moved them there at import time)
    names = list(QUERIES)
    assert set(names[WINDOW:]) == set(_DEFERRED)


def test_every_query_has_an_oracle_or_is_documented():
    """Every registered query should have an oracle (the driver's strong
    rows+schema+hash check); genuinely non-SQL-expressible ops are the
    only exception and there are currently none."""
    missing = [n for n in QUERIES if n not in ORACLES]
    assert missing == [], f"queries without oracles: {missing}"
