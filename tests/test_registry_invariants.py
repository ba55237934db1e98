"""Registry-invariant guard (r6 VERDICT #5): the driver verifies a 50-query
window, so the gate registry must stay EXACTLY 50, disjoint from the retired
set, and every retirement must document a prior green round — mechanically,
not by convention.  No Spark session needed (pure driver-side introspection),
so this runs first and fails fast on any registry edit violating the policy."""

import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry


def test_registry_is_exactly_fifty():
    qs = entry.queries()
    assert len(qs) == 50, (
        f"queries() must register exactly 50 gates (the driver's verification "
        f"window), got {len(qs)} — retire with rationale in RETIRED_GATES "
        f"instead of growing past the window"
    )


def test_no_overlap_with_retired_gates():
    overlap = set(entry.queries()) & set(entry.RETIRED_GATES)
    assert not overlap, f"gates both registered and retired: {sorted(overlap)}"


def test_every_retirement_documents_coverage():
    for name, why in entry.RETIRED_GATES.items():
        assert isinstance(why, str) and len(why) >= 20, (
            f"retired gate {name!r} needs a real rationale"
        )
        # each rationale must point at surviving coverage: a sibling gate,
        # a tests/ module, a superseding gate, or another documented
        # retirement (transitive coverage, e.g. check_by_event_type ->
        # check_by_returnflag -> check_by_file_lineitem)
        has_coverage = (
            "tests/" in why
            or any(g in why for g in entry.queries())
            or any(g in why for g in entry.RETIRED_GATES if g != name)
            or "superseded" in why
            or "covered" in why
            or "gates" in why
        )
        assert has_coverage, f"retired gate {name!r} names no surviving coverage: {why}"


def test_every_gate_has_oracle_sql():
    oracles = entry.oracle_sql()
    missing = [name for name in entry.queries() if name not in oracles]
    assert not missing, f"gates without oracle SQL: {missing}"


def test_oracle_sql_text_is_stable_for_registered_gates():
    """Every registered gate's oracle must be non-trivial SQL (the driver
    fingerprints the text; an emptied oracle would grade as a regression)."""
    oracles = entry.oracle_sql()
    for name in entry.queries():
        sql = oracles[name]
        assert isinstance(sql, str) and len(sql.strip()) > 20, name
        assert re.search(r"(?i)select", sql), f"oracle for {name} is not SQL"
