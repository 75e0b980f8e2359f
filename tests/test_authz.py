"""SQL-standard authorization pins (operators/authz.py —
SQLStdHiveAccessController / SQLStdHiveAuthorizationValidator)."""

from __future__ import annotations

import pytest

from apache_hive_2_1_1_src_spark.operators.authz import (
    ADMIN_ROLE,
    AuthorizationError,
    Authorizer,
)


def test_transitive_role_chain_grants_privilege():
    az = Authorizer()
    for r in ("a", "b", "c"):
        az.create_role(r)
    az.grant_role("a", "u")   # u inherits a
    az.grant_role("b", "a")   # a inherits b
    az.grant_role("c", "b")   # b inherits c
    az.grant("SELECT", "t", "c")
    assert az.has_privilege("u", "t", "SELECT")
    az.revoke_role("b", "a")  # break the chain in the middle
    assert not az.has_privilege("u", "t", "SELECT")


def test_cycles_rejected_at_any_depth():
    az = Authorizer()
    for r in ("a", "b", "c"):
        az.create_role(r)
    az.grant_role("b", "a")
    az.grant_role("c", "b")
    with pytest.raises(ValueError, match="cycle"):
        az.grant_role("a", "c")
    with pytest.raises(ValueError, match="cycle"):
        az.grant_role("a", "a")


def test_admin_role_bypasses_object_checks():
    az = Authorizer()
    az.grant_role(ADMIN_ROLE, "root_user")
    assert az.has_privilege("root_user", "anything", "DELETE")
    with pytest.raises(AuthorizationError):
        az.check("someone_else", "anything", "DELETE")


def test_public_role_grants_everyone():
    az = Authorizer()
    az.grant("SELECT", "t", "public")
    assert az.has_privilege("anyone", "t", "SELECT")
    assert not az.has_privilege("anyone", "t", "INSERT")


def test_drop_role_strips_grants_and_membership():
    az = Authorizer()
    az.create_role("r")
    az.grant_role("r", "u")
    az.grant("SELECT", "t", "r")
    az.drop_role("r")
    assert not az.has_privilege("u", "t", "SELECT")
    assert "r" not in az.show_roles()
    with pytest.raises(ValueError):
        az.drop_role(ADMIN_ROLE)


def test_set_role_restricts_and_restores():
    """SET ROLE (set_role_*.q; SQLStdHiveAccessController.setCurrentRole):
    activating one role hides privileges carried by the user's OTHER
    roles; NONE drops to direct grants; ALL restores the closure;
    activating a non-member role errors."""
    import pytest as _pytest

    from apache_hive_2_1_1_src_spark.operators.authz import (
        AuthorizationError,
        Authorizer,
    )

    az = Authorizer()
    az.create_role("readers")
    az.create_role("writers")
    az.grant_role("readers", "u")
    az.grant_role("writers", "u")
    az.grant("SELECT", "t", "readers")
    az.grant("INSERT", "t", "writers")
    az.grant("DELETE", "t", "u")  # direct user grant

    assert az.has_privilege("u", "t", "SELECT")
    assert az.has_privilege("u", "t", "INSERT")
    az.set_role("u", "readers")
    assert az.has_privilege("u", "t", "SELECT")
    assert not az.has_privilege("u", "t", "INSERT"), "writers must be inactive"
    assert az.has_privilege("u", "t", "DELETE"), "direct grants survive SET ROLE"
    assert az.show_current_roles("u") == ["readers"]
    az.set_role("u", "NONE")
    assert not az.has_privilege("u", "t", "SELECT")
    assert az.has_privilege("u", "t", "DELETE")
    az.set_role("u", "ALL")
    assert az.has_privilege("u", "t", "INSERT")
    with _pytest.raises(AuthorizationError, match="does not belong"):
        az.set_role("u", "admins_only")


def test_set_role_activates_nested_roles():
    from apache_hive_2_1_1_src_spark.operators.authz import Authorizer

    az = Authorizer()
    az.create_role("outer")
    az.create_role("inner")
    az.grant_role("inner", "outer")  # outer contains inner
    az.grant_role("outer", "u")
    az.grant("SELECT", "t", "inner")
    az.set_role("u", "outer")
    assert az.has_privilege("u", "t", "SELECT"), "nested role must activate"
