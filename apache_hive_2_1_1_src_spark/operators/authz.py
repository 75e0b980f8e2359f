"""SQL-standard-based authorization: roles, grants, privilege checks.

Reference surface being re-expressed (not translated):

* ``ql/src/java/org/apache/hadoop/hive/ql/security/authorization/plugin/
  sqlstd/SQLStdHiveAuthorizationValidator.java`` — privilege checks per
  operation against the required-privilege table.
* ``SQLStdHiveAccessController.java`` (same package) — CREATE/DROP ROLE,
  GRANT/REVOKE ROLE (incl. role-to-role membership), GRANT/REVOKE
  privileges, SHOW GRANT / SHOW ROLES / SHOW CURRENT ROLES.
* ``metastore/.../ObjectStore.java`` role/grant tables — here an
  in-memory metadata store (the state is KB-sized control-plane data;
  a deployment persists it in the metastore DB exactly like the txn
  log and lock table siblings in operators/acid.py).

Model (SQL-standard semantics, as Hive 2.1 implements them):

* principals are USERs or ROLEs; roles may be granted to users AND to
  other roles (membership is transitive; grant cycles are rejected).
* privileges (SELECT/INSERT/UPDATE/DELETE) attach to (object,
  principal); a user holds a privilege iff it is granted to the user
  directly or to any role reachable from the user's role closure —
  computed with a BFS over the role graph (driver-side: the role graph
  is metadata, never data-sized).
* the special ``admin`` role (SQLStdHiveAccessController.ADMIN_ROLE)
  bypasses object checks, like Hive's admin-role members.
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: SQLStdHiveAccessController's object privileges plus the legacy
#: DefaultHiveAuthorizationProvider set the grant_* corpus exercises
#: (PrivilegeType.java: ALL/ALTER_DATA/ALTER_METADATA/CREATE/DROP/
#: INDEX/LOCK/SELECT/SHOW_DATABASE/INSERT/UPDATE/DELETE)
PRIVILEGES = (
    "SELECT", "INSERT", "UPDATE", "DELETE",
    "ALL", "CREATE", "DROP", "ALTER", "INDEX", "LOCK", "SHOW_DATABASE",
)
ADMIN_ROLE = "admin"


class AuthorizationError(RuntimeError):
    """Raised when a privilege check fails (HiveAccessControlException)."""


@dataclass
class Authorizer:
    """In-memory SQL-std authorization state + checks."""

    roles: set[str] = field(default_factory=lambda: {ADMIN_ROLE, "public"})
    #: principal -> set of roles granted directly (principal may be a
    #: user name or another role name)
    role_grants: dict[str, set[str]] = field(default_factory=dict)
    #: (object, principal) -> set of privileges
    grants: dict[tuple[str, str], set[str]] = field(default_factory=dict)
    #: hive.users.in.admin.role (data/conf/hive-site.xml:264 ships
    #: hive_admin_user) — users who may SET ROLE admin without a grant
    admin_users: set[str] = field(
        default_factory=lambda: {"hive_admin_user"}
    )

    # -- role DDL ---------------------------------------------------------
    # role names are case-INSENSITIVE in SQL-standard auth
    # (HiveAuthzPluginException text uses lowercase; authorization_role_
    # grant2.q creates srC_role_wadmin and grants src_role_wadmin) —
    # normalize to lowercase at every entry point
    def create_role(self, role: str) -> None:
        role = role.lower()
        if role in self.roles:
            raise ValueError(f"role already exists: {role}")
        self.roles.add(role)

    def drop_role(self, role: str) -> None:
        role = role.lower()
        if role in (ADMIN_ROLE, "public"):
            raise ValueError(f"cannot drop reserved role: {role}")
        self.roles.discard(role)
        self.role_grants = {
            p: {r for r in rs if r != role}
            for p, rs in self.role_grants.items()
            if p != role
        }
        self.grants = {
            (o, p): ps for (o, p), ps in self.grants.items() if p != role
        }

    def grant_role(self, role: str, principal: str) -> None:
        """GRANT ROLE role TO USER/ROLE principal.  Rejects unknown roles
        and membership cycles (SQLStdHiveAccessController checks both)."""
        role = role.lower()
        if role not in self.roles:
            raise ValueError(f"no such role: {role}")
        # the new edge makes `principal` inherit `role`; if `role` already
        # (transitively) inherits `principal`, membership would cycle
        if principal in self.roles and (
            principal == role or principal in self._closure(role)
        ):
            raise ValueError(f"role cycle: {role} <-> {principal}")
        self.role_grants.setdefault(principal, set()).add(role)

    def revoke_role(self, role: str, principal: str) -> None:
        self.role_grants.get(principal, set()).discard(role.lower())

    def _closure(self, principal: str) -> set[str]:
        """All roles reachable from a principal (BFS, cycle-safe)."""
        seen: set[str] = set()
        frontier = list(self.role_grants.get(principal, ()))
        while frontier:
            r = frontier.pop()
            if r in seen:
                continue
            seen.add(r)
            frontier.extend(self.role_grants.get(r, ()))
        return seen

    # -- object privileges ------------------------------------------------
    def grant(self, privilege: str, obj: str, principal: str) -> None:
        if privilege not in PRIVILEGES:
            raise ValueError(f"unknown privilege: {privilege}")
        self.grants.setdefault((obj, principal), set()).add(privilege)

    def revoke(self, privilege: str, obj: str, principal: str) -> None:
        self.grants.get((obj, principal), set()).discard(privilege)

    # -- SET ROLE (set_role_admin/set_role_*.q; HiveAuthorizer.setCurrentRole
    # via SQLStdHiveAccessController — restricts which of the user's roles
    # are ACTIVE for privilege checks; 'ALL' restores the full closure,
    # 'NONE' drops to direct/user/public grants only) --------------------
    def set_role(self, user: str, role: str) -> None:
        if role.upper() == "ALL":
            getattr(self, "_active_roles", {}).pop(user, None)
            return
        if not hasattr(self, "_active_roles"):
            self._active_roles: dict[str, set[str]] = {}
        if role.upper() == "NONE":
            self._active_roles[user] = set()
            return
        if role not in self.roles and role.lower() in self.roles:
            role = role.lower()  # SET ROLE ADMIN == set role admin
        if role.lower() == ADMIN_ROLE and user in getattr(
            self, "admin_users", ()
        ):
            # hive.users.in.admin.role (hive-site.xml:264): listed users
            # may activate the admin role without an explicit grant
            self.grant_role(ADMIN_ROLE, user)
        if role.lower() == "public":
            # every user belongs to PUBLIC implicitly
            # (SQLStdHiveAccessController.getRolesFromMetastore)
            self._active_roles[user] = {"public"}
            return
        if role not in self._closure(user):
            raise AuthorizationError(
                f"Permission denied: user [{user}] does not belong to "
                f"role [{role}]"
            )
        self._active_roles[user] = {role} | self._closure(role)

    def _effective_roles(self, user: str) -> set[str]:
        active = getattr(self, "_active_roles", {}).get(user)
        return self._closure(user) if active is None else active

    def has_privilege(self, user: str, obj: str, privilege: str) -> bool:
        closure = self._effective_roles(user)
        if ADMIN_ROLE in closure:
            return True
        for principal in {user, "public", *closure}:
            held = self.grants.get((obj, principal), ())
            if privilege in held or "ALL" in held:
                return True
        return False

    def check(self, user: str, obj: str, privilege: str) -> None:
        """Raise AuthorizationError unless the user holds the privilege —
        the validator's contract (SQLStdHiveAuthorizationValidator
        checkPrivileges)."""
        if not self.has_privilege(user, obj, privilege):
            raise AuthorizationError(
                f"Permission denied: user [{user}] does not have "
                f"[{privilege}] privilege on [{obj}]"
            )

    # -- SHOW surface -----------------------------------------------------
    def show_roles(self) -> list[str]:
        return sorted(self.roles)

    def show_current_roles(self, user: str) -> list[str]:
        # reflects SET ROLE: the ACTIVE set, not the full grant closure
        return sorted(self._effective_roles(user))

    def show_grant(self, principal: str | None = None) -> list[tuple]:
        """SHOW GRANT [principal]: (object, principal, privilege) rows."""
        rows = [
            (obj, p, priv)
            for (obj, p), privs in sorted(self.grants.items())
            for priv in sorted(privs)
            if principal is None or p == principal
        ]
        return rows
