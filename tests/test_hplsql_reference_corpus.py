"""Run the reference's OWN HPL/SQL local test corpus through the
interpreter, in place (read-only from the reference checkout), and
compare against the reference's OWN golden outputs.

This is the strongest honest parity check available: inputs and
expectations both come from hplsql/src/test/{queries,results}/local —
nothing is adapted or re-derived.  Golden lines are normalized the same
way a reader of those files would: the ``Ln:N`` statement-trace lines
and ``EXEC FUNCTION/PROCEDURE`` trace lines are execution-log noise,
the remaining lines are the script's actual PRINT stream.

66 of the 68 scripts with goldens pass byte-for-byte.  The two
exclusions: the BTEQ dot-command dialect (if3_bteq), and
create_package — whose golden records the reference LOSING the
function's return value (``pack1.f1:`` printed empty where
f1 = p1+p2+a+b = 12); packages themselves work (create_package2
passes) and we deliberately return the correct value instead of
reproducing that defect.

Skips cleanly when the reference checkout is not present.
"""

from __future__ import annotations

import os

import pytest

from apache_hive_2_1_1_src_spark.hplsql import HplsqlInterpreter

BASE = "/root/reference/hplsql/src/test"

# every local script that must reproduce its golden print stream
PASSING = """
add assign bool bool_expr break case cast char coalesce concat
create_function create_function2 create_function3 create_function4
create_package2 create_procedure create_procedure2 create_procedure3
create_procedure_no_params datatypes date dbms_output declare declare2
declare3 declare_condition declare_condition2 decode equal exception
exception_divide_by_zero exit expr float for_range if if2 include
instr interval lang leave len length lower mult_div nvl nvl2 print
replace return seterror sub substr substring timestamp timestamp_iso
to_char to_timestamp trim twopipes upper values_into var_scope
var_scope2 while
""".split()

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference checkout not available"
)


def _golden(name: str) -> list[str]:
    with open(f"{BASE}/results/local/{name}.out.txt") as fh:
        return [
            line
            for line in fh.read().splitlines()
            if not line.startswith(("Ln:", "EXEC ", "INLCUDE "))
        ]


@pytest.mark.parametrize("name", PASSING)
def test_reference_local_script(name):
    with open(f"{BASE}/queries/local/{name}.sql") as fh:
        src = fh.read()
    interp = HplsqlInterpreter(include_base="/root/reference/hplsql")
    assert interp.run(src) == _golden(name)


def test_coverage_floor():
    """At least 66 of the reference's local scripts must stay pinned —
    a shrinking PASSING list is a regression, not a cleanup."""
    assert len(PASSING) >= 66
