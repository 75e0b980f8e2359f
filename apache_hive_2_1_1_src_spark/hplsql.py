"""HPL/SQL procedural dialect — an interpreter for the core of the
reference's ``hplsql/`` module (Hplsql.g4 grammar, Exec.java evaluator,
Stmt.java statement handlers), re-expressed as a driver-side control
plane over the Spark engine.

Supported surface (mirrors hplsql/src/test/queries/local coverage):
DECLARE (multi-name, DEFAULT/=), SET (multi-assign, tuple form),
``:=`` and bare assignment, PRINT, bare-expression statements (value
printed, as Exec.java does for standalone expressions), IF/ELSIF/ELSE,
WHILE with LOOP and DO variants, FOR range loops (REVERSE, loop var
scoped to the loop), FOR cursor loops over a query, EXIT [label]
[WHEN cond], BREAK, CONTINUE, loop labels ``<<lbl>>``,
BEGIN/EXCEPTION WHEN OTHERS/END blocks, RETURN, CREATE PROCEDURE with
IN/OUT/INOUT params + CALL (OUT args copy back), CREATE FUNCTION +
invocation from expressions, EXECUTE IMMEDIATE, SELECT ... INTO, and
pass-through of any other SQL statement to the engine.

Expressions are evaluated locally (as the reference's Exec.java does —
it does NOT ship a query per expression): literals, variables,
arithmetic (+ - * / %), ``||``, comparisons, AND/OR/NOT, BETWEEN,
IS [NOT] NULL, simple and searched CASE, and a builtin catalog
(CONCAT null-skipping per Hive's udf, NVL, NVL2, COALESCE, DECODE,
UPPER, LOWER, LENGTH/LEN, SUBSTR, INSTR, TRIM, ABS, MOD, REPLACE).
Anything else falls back to one-row ``SELECT`` through the attached
engine, so engine semantics win for the long tail.

Scale note: this is deliberately driver-side — procedural control flow
is a control plane, exactly as the reference runs HPL/SQL on the client
and pushes each SQL statement to the cluster.  Data never loops through
Python; cursor FOR loops iterate ``toLocalIterator``-style over
collected rows only when the user writes a row-at-a-time loop.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from decimal import Decimal
from typing import Any, Callable, Optional

# ------------------------------------------------------------------- lexer
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>--[^\n]*|/\*.*?\*/)
  | (?P<number>\d+\.\d+|\.\d+|\d+)
  | (?P<string>'(?:[^']|'')*')
  | (?P<label><<[A-Za-z_][\w]*>>)
  | (?P<qident>"[^"]*"|`[^`]*`|\[[^\]]*\])
  | (?P<ident>[@#$]*[A-Za-z_][\w$#@]*(?:\.[A-Za-z_][\w$#@]*)*)
  | (?P<op>:=|\.\.|\|\||<>|!=|<=|>=|==|[=<>+\-*/%(),;:.])
    """,
    re.VERBOSE | re.DOTALL,
)

_KEYWORDS = {
    "declare", "set", "print", "if", "then", "elsif", "elseif", "else",
    "end", "while", "loop", "do", "for", "in", "reverse", "exit", "when",
    "break", "continue", "begin", "exception", "others", "return",
    "create", "or", "replace", "procedure", "function", "returns", "call",
    "execute", "immediate", "into", "and", "not", "between", "is", "null",
    "true", "false", "case", "default", "as", "values", "leave", "cast",
    "date", "timestamp", "interval", "constant", "handler",
}

# interval unit suffixes (1 DAY, 3 DAYS, 1 MICROSECOND ...)
_UNITS = {
    "day": "days", "days": "days",
    "hour": "hours", "hours": "hours",
    "minute": "minutes", "minutes": "minutes",
    "second": "seconds", "seconds": "seconds",
    # the reference's Var timestamps carry millisecond precision, so its
    # MICROSECOND arithmetic lands on the millisecond (interval.out.txt:
    # 10:10:10.000 + 1 MICROSECOND prints 10:10:10.001) — reproduced here
    "microsecond": "milliseconds", "microseconds": "milliseconds",
    "millisecond": "milliseconds", "milliseconds": "milliseconds",
}


@dataclass
class Tok:
    kind: str  # 'num' | 'str' | 'ident' | 'kw' | 'op' | 'label' | 'eof'
    text: str
    line: int


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    pos, line = 0, 1
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"HPL/SQL: bad character {src[pos]!r} at line {line}")
        text = m.group(0)
        line += text.count("\n")
        pos = m.end()
        if m.lastgroup in ("ws", "comment"):
            continue
        if m.lastgroup == "number":
            toks.append(Tok("num", text, line))
        elif m.lastgroup == "string":
            toks.append(Tok("str", text[1:-1].replace("''", "'"), line))
        elif m.lastgroup == "label":
            toks.append(Tok("label", text[2:-2], line))
        elif m.lastgroup == "qident":
            toks.append(Tok("ident", text[1:-1], line))
        elif m.lastgroup == "ident":
            low = text.lower()
            toks.append(Tok("kw" if low in _KEYWORDS else "ident", text, line))
        else:
            toks.append(Tok("op", text, line))
    toks.append(Tok("eof", "", line))
    return toks


# ------------------------------------------------------------------ parser
# AST nodes are plain tuples: (kind, ...)


class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    # -- token helpers
    def peek(self, k: int = 0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def at(self, text: str, k: int = 0) -> bool:
        t = self.peek(k)
        return t.text.lower() == text.lower() and t.kind in ("kw", "op", "ident")

    def eat(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> Tok:
        if not self.at(text):
            t = self.peek()
            raise SyntaxError(
                f"HPL/SQL line {t.line}: expected {text!r}, got {t.text!r}"
            )
        return self.eat()

    def skip_semi(self) -> None:
        while self.at(";"):
            self.eat()

    # -- program
    def parse_program(self) -> list:
        stmts = []
        while self.peek().kind != "eof":
            stmts.append(self.parse_stmt())
            self.skip_semi()
        return stmts

    def parse_block_until(self, *terminators: str) -> list:
        stmts = []
        while True:
            self.skip_semi()
            t = self.peek()
            if t.kind == "eof":
                raise SyntaxError(
                    f"HPL/SQL: unexpected end of script, expected {terminators}"
                )
            if any(self.at(term) for term in terminators):
                return stmts
            # two-word terminators (END IF / END LOOP / END WHILE / END CASE)
            if "end" in terminators and self.at("end"):
                return stmts
            stmts.append(self.parse_stmt())

    # -- statements
    def parse_stmt(self):
        t = self.peek()
        if t.kind == "label":
            self.eat()
            inner = self.parse_stmt()
            return ("labeled", t.text.lower(), inner)
        # `lbl:` label form (leave.sql, T-SQL/MySQL style)
        if t.kind == "ident" and self.peek(1).text == ":":
            self.eat()
            self.eat()
            inner = self.parse_stmt()
            return ("labeled", t.text.lower(), inner)
        low = t.text.lower()
        if low == "declare":
            return self.parse_declare()
        if low == "set":
            return self.parse_set()
        if low == "print":
            self.eat()
            return ("print", self.parse_expr())
        if low == "if":
            return self.parse_if()
        if low == "while":
            return self.parse_while()
        if low == "for":
            return self.parse_for()
        if low == "exit":
            self.eat()
            label = None
            if self.peek().kind == "ident" and not self.at("when"):
                label = self.eat().text.lower()
            cond = None
            if self.at("when"):
                self.eat()
                cond = self.parse_expr()
            return ("exit", label, cond)
        if low == "break":
            self.eat()
            return ("exit", None, None)
        if low == "leave":
            self.eat()
            label = None
            if self.peek().kind == "ident":
                label = self.eat().text.lower()
            return ("exit", label, None)
        if low == "continue":
            self.eat()
            return ("continue",)
        if low == "null" and self.peek(1).text == ";":
            self.eat()
            return ("nop",)
        if low == "values":
            # VALUES expr INTO v  |  VALUES (e1, e2) INTO (v1, v2)
            self.eat()
            exprs = []
            if self.at("("):
                self.eat()
                exprs.append(self.parse_expr())
                while self.at(","):
                    self.eat()
                    exprs.append(self.parse_expr())
                self.expect(")")
            else:
                exprs.append(self.parse_expr())
            self.expect("into")
            names = []
            if self.at("("):
                self.eat()
                names.append(self.eat().text.lower())
                while self.at(","):
                    self.eat()
                    names.append(self.eat().text.lower())
                self.expect(")")
            else:
                names.append(self.eat().text.lower())
                while self.at(","):
                    self.eat()
                    names.append(self.eat().text.lower())
            return ("set_multi", list(zip(names, exprs)))
        if low == "cmp" and self.peek(1).text.lower() in ("row_count", "sum"):
            self.eat()
            mode = self.eat().text.lower()
            t1 = self.parse_cmp_target()
            self.expect(",")
            t2 = self.parse_cmp_target()
            if self.at("at"):
                self.eat()
                self.eat()  # named connection — single-engine here
            return ("cmp", mode, t1, t2)
        if low == "copy":
            self.eat()
            if self.at("("):
                self.eat()
                src = self.consume_cursor_sql()
            else:
                src = f"SELECT * FROM {self.eat().text}"
            self.expect("to")
            dest = self.eat().text.lower()
            if self.at("at"):
                self.eat()
                self.eat()
            return ("copy", src, dest)
        if low == "host":
            self.eat()
            return ("host", self.parse_expr())
        if low == "include":
            line = self.eat().line
            if self.peek().kind == "str":
                return ("include", self.parse_expr())
            parts = []
            while (
                self.peek().kind != "eof"
                and not self.at(";")
                and self.peek().line == line
            ):
                parts.append(self.eat().text)
            return ("include", ("lit", "".join(parts)))
        if low in ("function", "procedure", "proc"):
            # Oracle-style routine definition without CREATE
            return self.parse_routine(low == "function")
        if low == "signal" and self.peek(1).kind == "ident":
            self.eat()
            return ("signal", self.eat().text.lower())
        if low == "begin":
            return self.parse_begin()
        if low == "return":
            self.eat()
            if self.at(";") or self.peek().kind == "eof" or self.at("end"):
                return ("return", None)
            return ("return", self.parse_expr())
        if low == "create":
            return self.parse_create()
        if low == "call":
            self.eat()
            name = self.eat().text.lower()
            args = self.parse_call_args()
            return ("call", name, args)
        if low == "execute":
            self.eat()
            self.expect("immediate")
            return ("execute_immediate", self.parse_expr())
        if low == "open" and self.peek(1).kind == "ident":
            self.eat()
            return ("open_cursor", self.eat().text.lower())
        if low == "fetch" and self.peek(1).kind == "ident":
            self.eat()
            name = self.eat().text.lower()
            self.expect("into")
            vars_ = [self.eat().text.lower()]
            while self.at(","):
                self.eat()
                vars_.append(self.eat().text.lower())
            return ("fetch_cursor", name, vars_)
        if low == "close" and self.peek(1).kind == "ident":
            self.eat()
            return ("close_cursor", self.eat().text.lower())
        if low == "select":
            return self.parse_select_stmt()
        if low in ("insert", "drop", "truncate", "update", "delete", "merge",
                   "use", "with", "analyze", "msck", "show", "describe",
                   "load", "export", "import"):
            return ("sql", self.consume_sql_text())
        # assignment: ident := expr  |  ident = expr
        if t.kind == "ident" and self.peek(1).text in (":=", "="):
            name = self.eat().text.lower()
            self.eat()
            return ("assign", name, self.parse_expr())
        # bare expression statement — value is printed (Exec.java behavior
        # for standalone expressions, see concat.sql golden)
        return ("exprstmt", self.parse_expr())

    def consume_sql_text(self) -> str:
        """Capture a pass-through SQL statement verbatim up to ``;``."""
        parts = []
        depth = 0
        while self.peek().kind != "eof":
            t = self.peek()
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
            elif t.text == ";" and depth == 0:
                break
            parts.append(self.render_token(self.eat()))
        return " ".join(parts)

    @staticmethod
    def render_token(t: Tok) -> str:
        if t.kind == "str":
            return "'" + t.text.replace("'", "''") + "'"
        return t.text

    def parse_declare(self):
        """DECLARE — both the single-statement form and the Oracle-style
        declaration section (name TYPE [:=|=|DEFAULT expr]; repeated up
        to BEGIN), plus CURSOR declarations and MySQL-style CONTINUE
        HANDLERs.  Items: ('var', names, init) | ('cursor', name, sql) |
        ('handler', stmt)."""
        self.expect("declare")
        items: list = []
        while True:
            if self.at("cursor"):  # CURSOR c IS|FOR SELECT ...
                self.eat()
                name = self.eat().text.lower()
                if self.at("is") or self.at("for"):
                    self.eat()
                items.append(("cursor", name, self.consume_sql_text()))
            elif (self.at("continue") or self.at("exit")) and self.at("handler", 1):
                # DECLARE CONTINUE|EXIT HANDLER FOR <condition> <stmt>
                mode = self.eat().text.lower()
                self.eat()
                self.expect("for")
                cond = self.eat().text.lower()  # sqlexception | a condition
                items.append(("handler", mode, cond, self.parse_stmt()))
            else:
                items.append(("var", *self.parse_one_var_decl()))
            self.skip_semi()
            # declaration-section continuation: another `name TYPE ...`
            t, t1 = self.peek(), self.peek(1)
            if self.at("cursor") and t1.kind == "ident":
                continue
            if (self.at("continue") or self.at("exit")) and self.at("handler", 1):
                continue
            if self.at(","):  # DECLARE a INT, b STRING DEFAULT ... (one stmt)
                self.eat()
                continue
            if (
                t.kind == "ident"
                and t.text.lower() not in ("open", "fetch", "close")
                and (
                    t1.text == ","
                    or self.is_type_name(t1)
                    or t1.text.lower() == "constant"
                    or (t1.kind == "ident" and "." in t1.text)
                )
            ):
                continue
            break
        return ("declare", items)

    def parse_decl_name(self) -> str:
        """A declarable name: optional ':' sigil (``:new.abc``), then an
        identifier, with spaced ``.`` qualifiers joined (lang.sql)."""
        if self.at(":"):
            self.eat()
        name = self.eat().text.lower()
        while self.at(".") and self.peek(1).kind in ("ident", "kw"):
            self.eat()
            name += "." + self.eat().text.lower()
        return name

    def parse_one_var_decl(self):
        """One `n1 [, n2 ...] [CONSTANT] TYPE[(p)] [NOT NULL] [init]`."""
        names = [self.parse_decl_name()]
        while self.at(","):
            # lookahead: another name of the same type, or the next decl
            save = self.i
            self.eat()
            nxt = self.eat()
            if self.at(",") or self.is_type_name(self.peek()) or (
                nxt.kind == "ident" and self.is_type_name(self.peek())
            ):
                names.append(nxt.text.lower())
                continue
            self.i = save
            break
        if self.at("constant"):
            self.eat()
        self.eat()  # type name (INT, STRING, UTL_FILE.FILE_TYPE, ...)
        # optional precision (e.g. VARCHAR(10), DECIMAL(10,2))
        if self.at("("):
            depth = 0
            while True:
                tt = self.eat()
                if tt.text == "(":
                    depth += 1
                elif tt.text == ")":
                    depth -= 1
                    if depth == 0:
                        break
        if self.at("not") and self.at("null", 1):
            self.eat()
            self.eat()
        init = None
        if self.at("default") or self.at("=") or self.at(":="):
            self.eat()
            init = self.parse_expr()
        return (names, init)

    @staticmethod
    def is_type_name(t: Tok) -> bool:
        return t.text.lower() in (
            "int", "integer", "bigint", "smallint", "tinyint", "string",
            "varchar", "varchar2", "char", "dec", "decimal", "number",
            "numeric", "float", "double", "bool", "boolean", "date",
            "timestamp",
        )

    def parse_set(self):
        self.expect("set")
        if self.at("("):  # SET (a, b) = (1, 2)
            self.eat()
            names = [self.eat().text.lower()]
            while self.at(","):
                self.eat()
                names.append(self.eat().text.lower())
            self.expect(")")
            self.expect("=")
            self.expect("(")
            exprs = [self.parse_expr()]
            while self.at(","):
                self.eat()
                exprs.append(self.parse_expr())
            self.expect(")")
            return ("set_multi", list(zip(names, exprs)))
        pairs = []
        while True:
            name = self.eat().text.lower()
            if self.at("=") or self.at(":="):
                self.eat()
            pairs.append((name, self.parse_expr()))
            if self.at(","):
                self.eat()
                continue
            break
        return ("set_multi", pairs)

    def parse_if(self):
        self.expect("if")
        branches = []
        cond = self.parse_expr()
        if not self.at("then"):
            # Transact-SQL form: IF cond <stmt|BEGIN..END> [ELSE <stmt|BEGIN..END>]
            then_stmt = self.parse_stmt()
            self.skip_semi()
            else_body = []
            if self.at("else"):
                self.eat()
                else_body = [self.parse_stmt()]
            return ("if", [(cond, [then_stmt])], else_body)
        self.expect("then")
        body = self.parse_block_until("elsif", "elseif", "else", "end")
        branches.append((cond, body))
        while self.at("elsif") or self.at("elseif"):
            self.eat()
            c = self.parse_expr()
            self.expect("then")
            b = self.parse_block_until("elsif", "elseif", "else", "end")
            branches.append((c, b))
        else_body = []
        if self.at("else"):
            self.eat()
            else_body = self.parse_block_until("end")
        self.expect("end")
        self.expect("if")
        return ("if", branches, else_body)

    def parse_while(self):
        self.expect("while")
        cond = self.parse_expr()
        if self.at("loop"):
            self.eat()
            body = self.parse_block_until("end")
            self.expect("end")
            self.expect("loop")
        elif self.at("do") or self.at("then"):
            self.eat()
            body = self.parse_block_until("end")
            self.expect("end")
            if self.at("while"):
                self.eat()
        elif self.at("begin"):
            # Transact-SQL: WHILE cond BEGIN ... END
            self.eat()
            body = self.parse_block_until("end")
            self.expect("end")
        else:
            raise SyntaxError(
                f"HPL/SQL line {self.peek().line}: WHILE needs LOOP or DO"
            )
        return ("while", cond, body)

    def parse_for(self):
        self.expect("for")
        var = self.eat().text.lower()
        self.expect("in")
        if self.at("("):  # cursor loop
            self.eat()
            sql = self.consume_cursor_sql()
            self.expect("loop")
            body = self.parse_block_until("end")
            self.expect("end")
            self.expect("loop")
            return ("for_cursor", var, sql, body)
        reverse = False
        if self.at("reverse"):
            self.eat()
            reverse = True
        lo = self.parse_expr()
        self.expect("..")
        hi = self.parse_expr()
        step = None
        if self.at("by"):
            self.eat()
            step = self.parse_expr()
        self.expect("loop")
        body = self.parse_block_until("end")
        self.expect("end")
        self.expect("loop")
        return ("for_range", var, reverse, lo, hi, step, body)

    def parse_cmp_target(self) -> str:
        """A CMP operand: ``(subquery)`` or ``table [WHERE ...]`` up to
        the ',' / AT / ';' boundary (cmp_row_count.sql forms)."""
        if self.at("("):
            self.eat()
            return f"SELECT COUNT(*) AS n FROM ({self.consume_cursor_sql()})"
        parts = [self.eat().text]
        while (
            self.peek().kind != "eof"
            and not self.at(",")
            and not self.at(";")
            and not self.at("at")
        ):
            parts.append(self.render_token(self.eat()))
        return "SELECT COUNT(*) AS n FROM " + " ".join(parts)

    def consume_cursor_sql(self) -> str:
        parts = []
        depth = 1
        while self.peek().kind != "eof":
            t = self.peek()
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
                if depth == 0:
                    self.eat()
                    break
            parts.append(self.render_token(self.eat()))
        return " ".join(parts)

    def parse_begin(self):
        self.expect("begin")
        body = self.parse_block_until("exception", "end")
        handler = None
        if self.at("exception"):
            self.eat()
            # one or more WHEN <condition|OTHERS> THEN blocks; all route
            # to the same catch (named conditions beyond OTHERS are not
            # distinguished — exception.sql only exercises the catch)
            first = None
            while self.at("when"):
                self.eat()
                self.eat()  # OTHERS or a condition name (NO_DATA_FOUND, ...)
                self.expect("then")
                block = self.parse_block_until("when", "end")
                if first is None:
                    first = block
            handler = first or []
        self.expect("end")
        return ("begin", body, handler)

    def parse_create(self):
        self.expect("create")
        if self.at("or"):
            self.eat()
            self.expect("replace")
        if self.at("procedure") or self.at("function") or self.at("proc"):
            is_func = self.at("function")
            self.eat()
            return self.parse_routine(is_func, consumed_keyword=True)
        if self.at("package"):
            return self.parse_package()
        # any other CREATE → pass-through SQL
        self.i -= 1
        return ("sql", self.consume_sql_text())

    def parse_package(self):
        """CREATE [OR REPLACE] PACKAGE [BODY] name AS|IS <items> END —
        items are package variables, routine signatures (spec) and full
        routine definitions (body).  Package state lives in the
        interpreter's variable map under ``pkg.var`` names."""
        self.expect("package")
        is_body = False
        if self.at("body"):
            self.eat()
            is_body = True
        name = self.eat().text.lower()
        if self.at("as") or self.at("is"):
            self.eat()
        items: list = []
        while not self.at("end"):
            if self.at("function") or self.at("procedure") or self.at("proc"):
                is_func = self.at("function")
                self.eat()
                rname = self.eat().text.lower()
                params = self.parse_routine_params()
                if self.at("returns") or self.at("return"):
                    self.eat()
                    self.eat()
                    if self.at("("):
                        while not self.at(")"):
                            self.eat()
                        self.eat()
                if self.at(";") or not (
                    self.at("is") or self.at("as") or self.at("begin")
                    or self.at("declare")
                ):
                    # spec: signature only
                    self.skip_semi()
                    continue
                if self.at("as") or self.at("is"):
                    self.eat()
                pre = []
                if self.at("declare"):
                    pre.append(self.parse_declare())
                    self.skip_semi()
                while (
                    not self.at("begin")
                    and self.peek().kind == "ident"
                    and (
                        self.is_type_name(self.peek(1))
                        or self.peek(1).text == ","
                        or self.peek(1).text.lower() == "constant"
                    )
                ):
                    pre.append(("declare", [("var", *self.parse_one_var_decl())]))
                    self.skip_semi()
                body = self.parse_stmt()
                if pre:
                    body = ("seq", pre + [body])
                items.append(("routine", is_func, rname, params, body))
            else:
                items.append(("var", *self.parse_one_var_decl()))
            self.skip_semi()
        self.expect("end")
        return ("create_package", name, is_body, items)

    def parse_routine_params(self) -> list:
        params = []
        if self.at("("):
            self.eat()
            while not self.at(")"):
                mode = "in"
                if self.peek().text.lower() in ("in", "out", "inout"):
                    mode = self.eat().text.lower()
                pname = self.eat().text.lower()
                self.eat()  # type
                if self.at("("):
                    while not self.at(")"):
                        self.eat()
                    self.eat()
                params.append((mode, pname))
                if self.at(","):
                    self.eat()
            self.expect(")")
        return params

    def parse_routine(self, is_func: bool, consumed_keyword: bool = False):
        """Routine signature + optional declaration section + body.
        Handles CREATE PROCEDURE/FUNCTION and the bare Oracle
        ``FUNCTION name(...) RETURN type AS <decls> BEGIN...END`` form."""
        if not consumed_keyword:
            self.eat()  # FUNCTION | PROCEDURE
        name = self.eat().text.lower()
        params = []
        if self.at("("):
            self.eat()
            while not self.at(")"):
                mode = "in"
                if self.peek().text.lower() in ("in", "out", "inout"):
                    mode = self.eat().text.lower()
                pname = self.eat().text.lower()
                self.eat()  # type
                if self.at("("):
                    while not self.at(")"):
                        self.eat()
                    self.eat()
                params.append((mode, pname))
                if self.at(","):
                    self.eat()
            self.expect(")")
        if self.at("returns") or self.at("return"):
            self.eat()
            self.eat()  # return type
            if self.at("("):
                while not self.at(")"):
                    self.eat()
                self.eat()
        if self.at("as") or self.at("is"):
            self.eat()
        pre = []
        if self.at("declare"):
            pre.append(self.parse_declare())
            self.skip_semi()
        # Oracle AS/IS section: bare local decls before BEGIN
        while (
            not self.at("begin")
            and self.peek().kind == "ident"
            and (
                self.is_type_name(self.peek(1))
                or self.peek(1).text == ","
                or self.peek(1).text.lower() == "constant"
            )
        ):
            pre.append(("declare", [("var", *self.parse_one_var_decl())]))
            self.skip_semi()
        body = self.parse_stmt()  # BEGIN block (or single stmt)
        if pre:
            body = ("seq", pre + [body])
        return ("create_routine", is_func, name, params, body)

    def parse_select_stmt(self):
        """SELECT ... [INTO v1, v2, ...] FROM ... — detect INTO at the
        top nesting level; everything else passes through verbatim."""
        start = self.i
        parts = []
        into_vars: list[str] = []
        depth = 0
        seen_into_at = None
        while self.peek().kind != "eof":
            t = self.peek()
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
            elif t.text == ";" and depth == 0:
                break
            if depth == 0 and t.text.lower() == "into":
                seen_into_at = len(parts)
                self.eat()
                into_vars.append(self.eat().text.lower())
                while self.at(","):
                    self.eat()
                    into_vars.append(self.eat().text.lower())
                continue
            parts.append(self.render_token(self.eat()))
        del start, seen_into_at
        return ("select", " ".join(parts), into_vars)

    def parse_call_args(self) -> list:
        args = []
        if self.at("("):
            self.eat()
            while not self.at(")"):
                args.append(self.parse_expr())
                if self.at(","):
                    self.eat()
            self.expect(")")
        return args

    # -- expressions (precedence climbing)
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        left = self.parse_and()
        while self.at("or"):
            self.eat()
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.at("and"):
            self.eat()
            left = ("and", left, self.parse_not())
        return left

    def parse_not(self):
        if self.at("not"):
            self.eat()
            return ("not", self.parse_not())
        return self.parse_cmp()

    def parse_cmp(self):
        left = self.parse_add()
        t = self.peek()
        if t.kind == "op" and t.text in ("=", "==", "<>", "!=", "<", ">", "<=", ">="):
            op = self.eat().text
            return ("cmp", op, left, self.parse_add())
        if self.at("between"):
            self.eat()
            lo = self.parse_add()
            self.expect("and")
            hi = self.parse_add()
            return ("between", left, lo, hi)
        if self.at("is"):
            self.eat()
            neg = False
            if self.at("not"):
                self.eat()
                neg = True
            self.expect("null")
            return ("isnull", neg, left)
        return left

    def parse_add(self):
        left = self.parse_mul_with_unit()
        while self.peek().kind == "op" and self.peek().text in ("+", "-", "||"):
            op = self.eat().text
            left = ("bin", op, left, self.parse_mul_with_unit())
        return left

    def parse_mul_with_unit(self):
        """A multiplicative operand with an optional interval-unit
        suffix: ``1 DAY``, ``NVL(NULL, 3) DAYS`` (interval.sql)."""
        e = self.parse_mul()
        t = self.peek()
        if t.kind in ("ident", "kw") and t.text.lower() in _UNITS:
            unit = _UNITS[self.eat().text.lower()]
            return ("interval_of", e, unit)
        return e

    def parse_mul(self):
        left = self.parse_unary()
        while self.peek().kind == "op" and self.peek().text in ("*", "/", "%"):
            op = self.eat().text
            left = ("bin", op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.peek().kind == "op" and self.peek().text == "-":
            self.eat()
            return ("neg", self.parse_unary())
        if self.peek().kind == "op" and self.peek().text == "+":
            self.eat()
            return self.parse_unary()
        return self.parse_primary()

    def parse_primary(self):
        t = self.peek()
        if t.kind == "num":
            self.eat()
            if "." in t.text:
                return ("lit", Decimal(t.text))
            return ("lit", int(t.text))
        if t.kind == "str":
            self.eat()
            return ("lit", t.text)
        if self.at("null"):
            self.eat()
            return ("lit", None)
        if self.at("true"):
            self.eat()
            return ("lit", True)
        if self.at("false"):
            self.eat()
            return ("lit", False)
        if self.at("("):
            self.eat()
            e = self.parse_expr()
            self.expect(")")
            return e
        if self.at("case"):
            return self.parse_case()
        # typed literals: DATE '...', TIMESTAMP '...', INTERVAL 'n' unit
        if self.at("date") and self.peek(1).kind == "str":
            self.eat()
            return ("date_lit", self.eat().text)
        if self.at("timestamp") and self.peek(1).kind == "str":
            self.eat()
            return ("timestamp_lit", self.eat().text)
        if self.at("interval") and self.peek(1).kind in ("str", "num"):
            self.eat()
            n = self.eat().text
            unit_tok = self.eat()
            unit = _UNITS.get(unit_tok.text.lower())
            if unit is None:
                raise SyntaxError(
                    f"HPL/SQL line {unit_tok.line}: unknown interval unit "
                    f"{unit_tok.text!r}"
                )
            return ("interval_of", ("lit", int(n)), unit)
        if self.at("cast") and self.peek(1).text == "(":
            self.eat()
            self.eat()
            e = self.parse_expr()
            self.expect("as")
            typ = self.eat().text.lower()
            prec = None
            if self.at("("):
                self.eat()
                prec = int(self.eat().text)
                while not self.at(")"):
                    self.eat()
                self.expect(")")
            self.expect(")")
            return ("cast", e, typ, prec)
        if t.kind in ("ident", "kw"):
            self.eat()
            if self.at("("):
                # SUBSTRING(x FROM start [FOR len]) ANSI form
                if t.text.lower() in ("substr", "substring"):
                    save = self.i
                    self.eat()
                    first = self.parse_expr()
                    if self.at("from"):
                        self.eat()
                        start = self.parse_expr()
                        length = None
                        if self.at("for"):
                            self.eat()
                            length = self.parse_expr()
                        self.expect(")")
                        args = [first, start] + ([length] if length else [])
                        return ("fn", "substr", args)
                    self.i = save
                args = self.parse_call_args()
                return ("fn", t.text.lower(), args)
            # cursor attributes: c%ISOPEN / c%FOUND / c%NOTFOUND / c%ROWCOUNT
            if self.peek().text == "%" and self.peek(1).text.lower() in (
                "isopen", "found", "notfound", "rowcount"
            ):
                self.eat()
                attr = self.eat().text.lower()
                return ("cursor_attr", t.text.lower(), attr)
            return ("var", t.text.lower())
        raise SyntaxError(f"HPL/SQL line {t.line}: unexpected {t.text!r}")

    def parse_case(self):
        self.expect("case")
        subject = None
        if not self.at("when"):
            subject = self.parse_expr()
        whens = []
        while self.at("when"):
            self.eat()
            c = self.parse_expr()
            self.expect("then")
            v = self.parse_expr()
            whens.append((c, v))
        default = ("lit", None)
        if self.at("else"):
            self.eat()
            default = self.parse_expr()
        self.expect("end")
        return ("case", subject, whens, default)


# -------------------------------------------------------------- interpreter
class _Signal(Exception):
    """A raised HPL/SQL condition (SIGNAL <condition>)."""


class _Exit(Exception):
    def __init__(self, label: Optional[str]):
        self.label = label


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


@dataclass
class Routine:
    is_func: bool
    params: list
    body: Any
    pkg: Optional[str] = None


class _Ts:
    """datetime wrapper carrying the literal's fractional-digit scale:
    the reference's Var displays a timestamp with the scale of its
    source literal (interval.out.txt: TIMESTAMP '2015-03-12' - 1 DAY -
    1 MICROSECOND prints without a fraction, while the '.000' literal
    shows '.999')."""

    __slots__ = ("dt", "scale")

    def __init__(self, dt, scale: int):
        self.dt = dt
        self.scale = scale

    def __add__(self, other):
        return _Ts(self.dt + other, self.scale)

    def __sub__(self, other):
        return _Ts(self.dt - other, self.scale)

    def __eq__(self, other):
        o = other.dt if isinstance(other, _Ts) else other
        return self.dt == o

    def __lt__(self, other):
        o = other.dt if isinstance(other, _Ts) else other
        return self.dt < o

    def __le__(self, other):
        return self < other or self == other

    def __gt__(self, other):
        return not self <= other

    def __ge__(self, other):
        return not self < other

    def __hash__(self):
        return hash(self.dt)


@dataclass
class _Interval:
    """Interval value for date/timestamp arithmetic (1 DAY, 3 DAYS, ...)."""

    delta: Any  # datetime.timedelta


def _parse_date(s: str):
    import datetime as dt

    return dt.date.fromisoformat(s.strip())


def _parse_timestamp(s: str):
    """Timestamp literal: 'YYYY-MM-DD[ HH:MM:SS[.f...]]' plus the DB2
    dashed form 'YYYY-MM-DD-HH.MM.SS.fff' (timestamp.sql).  Fractions
    truncate to millisecond precision, as the reference's Var does."""
    import datetime as dt

    s = s.strip()
    m = re.match(r"^(\d{4}-\d{2}-\d{2})-(\d{2})\.(\d{2})\.(\d{2})(?:\.(\d+))?$", s)
    if m:  # DB2 dashed form
        s = f"{m.group(1)} {m.group(2)}:{m.group(3)}:{m.group(4)}"
        if m.group(5):
            s += f".{m.group(5)}"
    if " " not in s:
        d = dt.date.fromisoformat(s)
        return _Ts(dt.datetime(d.year, d.month, d.day), 0)
    datepart, timepart = s.split(" ", 1)
    frac, scale = 0, 0
    if "." in timepart:
        timepart, fracs = timepart.split(".", 1)
        scale = min(len(fracs), 3)
        frac = int(fracs[:3].ljust(3, "0")) * 1000  # µs, ms precision
    hh, mm, ss = (int(x) for x in timepart.split(":"))
    d = dt.date.fromisoformat(datepart)
    return _Ts(dt.datetime(d.year, d.month, d.day, hh, mm, ss, frac), scale)


@dataclass
class Cursor:
    sql: str
    is_open: bool = False
    rows: Optional[list] = None
    idx: int = 0
    fetched: int = 0
    found: Optional[bool] = None  # NULL before the first FETCH


_SILENT = object()  # return value of statement-style calls (PUT_LINE)


@dataclass
class HplsqlInterpreter:
    """Runs an HPL/SQL script.  ``engine`` is optional: anything the
    local evaluator can't handle (pass-through SQL, cursor loops,
    unknown functions) needs it; pure procedural scripts run without a
    SparkSession at all."""

    engine: Any = None  # HiveEngine or SparkSession-like with .sql()
    output: list[str] = field(default_factory=list)
    vars: dict[str, Any] = field(default_factory=dict)
    routines: dict[str, Routine] = field(default_factory=dict)
    cursors: dict[str, Cursor] = field(default_factory=dict)
    handler_stack: list = field(default_factory=list)
    pkg_stack: list = field(default_factory=list)
    pkg_vars: set = field(default_factory=set)
    local_stack: list = field(default_factory=list)
    include_base: str = "."
    last_select: Any = None  # DataFrame of the last top-level SELECT

    # -- entry point
    def run(self, src: str) -> list[str]:
        stmts = Parser(tokenize(src)).parse_program()
        try:
            self.exec_guarded(stmts)
        except _Return:
            pass  # top-level RETURN ends the script (return.sql)
        return self.output

    # -- statements
    def exec_block(self, stmts: list) -> None:
        for s in stmts:
            self.exec_stmt(s)

    def exec_guarded(self, stmts: list) -> None:
        """Run statements under a fresh DECLARE ... HANDLER scope
        (MySQL-style): on an exception, a CONTINUE handler runs and the
        block proceeds; an EXIT handler runs and the block ends."""
        self.handler_stack.append([])
        try:
            for stmt in stmts:
                try:
                    self.exec_stmt(stmt)
                except (_Exit, _Continue, _Return):
                    raise
                except Exception as exc:
                    # a handler fires for its named condition, or for any
                    # error when declared FOR SQLEXCEPTION/OTHERS
                    sig = exc.args[0] if isinstance(exc, _Signal) else None
                    fired = [
                        (mode, h)
                        for mode, cond, h in self.handler_stack[-1]
                        if (sig is not None and cond == sig)
                        or (sig is None and cond in ("sqlexception", "others"))
                    ]
                    if not fired:
                        raise
                    stop = False
                    for mode, h in fired:
                        self.exec_stmt(h)
                        stop = stop or mode == "exit"
                    if stop:
                        return
        finally:
            self.handler_stack.pop()

    def exec_stmt(self, s) -> None:
        kind = s[0]
        if kind == "declare":
            for item in s[1]:
                if item[0] == "var":
                    _, names, init = item
                    val = self.eval(init) if init is not None else None
                    for n in names:
                        self.scope()[n] = val
                elif item[0] == "cursor":
                    self.cursors[item[1]] = Cursor(sql=item[2])
                elif item[0] == "handler":
                    if self.handler_stack:
                        self.handler_stack[-1].append(item[1:])
        elif kind == "seq":
            for sub in s[1]:
                self.exec_stmt(sub)
        elif kind == "nop":
            pass
        elif kind == "assign":
            self.write_var(s[1], self.eval(s[2]))
        elif kind == "set_multi":
            for name, expr in s[1]:
                self.write_var(name, self.eval(expr))
        elif kind == "print":
            self.output.append(self.fmt(self.eval(s[1])))
        elif kind == "exprstmt":
            e = s[1]
            # a bare routine invocation statement (`sp1;` / `sp1();`)
            # prints nothing unless the routine returns a value
            name = e[1] if e[0] in ("var", "fn") else None
            name = self.resolve_routine(name) if name else None
            if name is not None:
                ret = self.call_routine(
                    name, e[2] if e[0] == "fn" else []
                )
                if ret is not None:
                    self.output.append(self.fmt(ret))
                return
            v = self.eval(e)
            if v is not _SILENT:
                self.output.append(self.fmt(v))
        elif kind == "declare_cursor":
            self.cursors[s[1]] = Cursor(sql=s[2])
        elif kind == "open_cursor":
            cur = self.cursor(s[1])
            df = self.sql(cur.sql)
            cur.rows = df.collect() if hasattr(df, "collect") else list(df)
            cur.is_open, cur.idx, cur.fetched, cur.found = True, 0, 0, None
        elif kind == "fetch_cursor":
            cur = self.cursor(s[1])
            if not cur.is_open:
                raise RuntimeError(f"HPL/SQL: cursor {s[1]!r} is not open")
            if cur.idx < len(cur.rows):
                row = cur.rows[cur.idx]
                for i, v in enumerate(s[2]):
                    self.write_var(v, row[i])
                cur.idx += 1
                cur.fetched += 1
                cur.found = True
            else:
                cur.found = False
        elif kind == "close_cursor":
            cur = self.cursor(s[1])
            cur.is_open, cur.rows, cur.found = False, None, None
        elif kind == "if":
            for cond, body in s[1]:
                if self.truthy(self.eval(cond)):
                    self.exec_block(body)
                    return
            self.exec_block(s[2])
        elif kind == "while":
            self.run_loop(None, lambda: self.loop_while(s[1], s[2]))
        elif kind == "labeled":
            label, inner = s[1], s[2]
            if inner[0] == "while":
                self.run_loop(label, lambda: self.loop_while(inner[1], inner[2]))
            elif inner[0] == "for_range":
                self.run_loop(label, lambda: self.loop_range(inner))
            elif inner[0] == "for_cursor":
                self.run_loop(label, lambda: self.loop_cursor(inner))
            else:
                self.exec_stmt(inner)
        elif kind == "for_range":
            self.run_loop(None, lambda: self.loop_range(s))
        elif kind == "for_cursor":
            self.run_loop(None, lambda: self.loop_cursor(s))
        elif kind == "exit":
            _, label, cond = s
            if cond is None or self.truthy(self.eval(cond)):
                raise _Exit(label)
        elif kind == "continue":
            raise _Continue()
        elif kind == "begin":
            _, body, handler = s
            try:
                self.exec_guarded(body)
            except (_Exit, _Continue, _Return):
                raise
            except Exception:
                if handler is None:
                    raise
                self.exec_block(handler)
        elif kind == "signal":
            raise _Signal(s[1])
        elif kind == "cmp":
            _, mode, q1, q2 = s
            if mode == "row_count":
                n1 = self.sql(q1).collect()[0][0]
                n2 = self.sql(q2).collect()[0][0]
                self.output.append(f"row_count\t{n1}\t{n2}")
            else:  # CMP SUM (Cmp.java): per-column checksum battery —
                # numeric columns sum directly, strings sum their lengths
                import re as _re

                def table_of(q: str) -> str:
                    m = _re.search(r"FROM\s+(.*)$", q, _re.IGNORECASE | _re.DOTALL)
                    return m.group(1) if m else q

                t1, t2 = table_of(q1), table_of(q2)
                df1 = self.sql(f"SELECT * FROM {t1} LIMIT 0")
                for fname, ftype in df1.dtypes:
                    if ftype in ("string", "varchar", "char"):
                        expr = f"SUM(LENGTH({fname}))"
                    elif ftype.startswith(("int", "bigint", "smallint",
                                           "tinyint", "double", "float",
                                           "decimal")):
                        expr = f"SUM({fname})"
                    else:
                        continue
                    v1 = self.sql(f"SELECT {expr} FROM {t1}").collect()[0][0]
                    v2 = self.sql(f"SELECT {expr} FROM {t2}").collect()[0][0]
                    self.output.append(
                        f"{fname}\t{self.fmt(v1)}\t{self.fmt(v2)}"
                    )
        elif kind == "copy":
            _, src, dest = s
            self.sql(f"DROP TABLE IF EXISTS {dest}")
            self.sql(f"CREATE TABLE {dest} AS {src}")
        elif kind == "host":
            # HOST 'cmd' (seterror.sql): run through the shell; a nonzero
            # exit raises into the surrounding EXCEPTION handler, which is
            # exactly what the reference's golden pins (FAILED printed by
            # the handler when the command does not exist)
            import subprocess

            cmd = self.eval(s[1])
            rc = subprocess.run(
                cmd, shell=True, capture_output=True
            ).returncode
            self.write_var("hostcode", rc)
            if rc != 0:
                raise RuntimeError(f"HOST command failed with code {rc}")
        elif kind == "include":
            import os as _os

            path = self.eval(s[1])
            full = path if _os.path.isabs(path) else _os.path.join(
                self.include_base, path
            )
            with open(full) as fh:
                self.exec_block(Parser(tokenize(fh.read())).parse_program())
        elif kind == "return":
            raise _Return(self.eval(s[1]) if s[1] is not None else None)
        elif kind == "create_package":
            _, pname, _is_body, items = s
            for item in items:
                if item[0] == "var":
                    _, names, init = item
                    val = self.eval(init) if init is not None else None
                    for n in names:
                        self.vars[f"{pname}.{n}"] = val
                        self.pkg_vars.add(f"{pname}.{n}")
                else:
                    _, is_func, rname, params, body = item
                    self.routines[f"{pname}.{rname}"] = Routine(
                        is_func, params, body, pkg=pname
                    )
        elif kind == "create_routine":
            _, is_func, name, params, body = s
            self.routines[name] = Routine(is_func, params, body)
        elif kind == "call":
            self.call_routine(self.resolve_routine(s[1]) or s[1], s[2])
        elif kind == "execute_immediate":
            sql = self.eval(s[1])
            self.last_select = self.sql(sql)
        elif kind == "select":
            _, sql, into_vars = s
            df = self.sql(sql)
            if into_vars:
                rows = df.collect() if hasattr(df, "collect") else list(df)
                if rows:
                    row = rows[0]
                    for i, v in enumerate(into_vars):
                        self.write_var(v, row[i])
                else:
                    for v in into_vars:
                        self.write_var(v, None)
            else:
                self.last_select = df
        elif kind == "sql":
            self.last_select = self.sql(s[1])
        else:
            raise NotImplementedError(f"HPL/SQL statement {kind}")

    def run_loop(self, label: Optional[str], body: Callable[[], None]) -> None:
        try:
            body()
        except _Exit as e:
            if e.label is not None and e.label != (label or ""):
                raise  # propagate to the labeled outer loop

    def loop_while(self, cond, body) -> None:
        while self.truthy(self.eval(cond)):
            try:
                self.exec_block(body)
            except _Continue:
                continue

    def loop_range(self, s) -> None:
        _, var, reverse, lo_e, hi_e, step_e, body = s
        lo, hi = int(self.eval(lo_e)), int(self.eval(hi_e))
        step = int(self.eval(step_e)) if step_e is not None else 1
        rng = range(lo, hi - 1, -step) if reverse else range(lo, hi + 1, step)
        sc = self.scope()
        saved = sc.get(var, _MISSING := object())
        try:
            for i in rng:
                sc[var] = i
                try:
                    self.exec_block(body)
                except _Continue:
                    continue
        finally:
            # loop variable is scoped to the loop (for_range.sql golden:
            # outer i keeps its pre-loop value)
            if saved is _MISSING:
                sc.pop(var, None)
            else:
                sc[var] = saved

    def loop_cursor(self, s) -> None:
        _, var, sql, body = s
        df = self.sql(sql)
        rows = df.collect() if hasattr(df, "collect") else list(df)
        cols = [c.lower() for c in df.columns] if hasattr(df, "columns") else None
        sc = self.scope()
        for row in rows:
            if cols:
                for i, c in enumerate(cols):
                    sc[f"{var}.{c}"] = row[i]
            sc[var] = row
            try:
                self.exec_block(body)
            except _Continue:
                continue

    def scope(self) -> dict:
        """The dict a DECLARE/new-variable write lands in: the current
        routine's local scope, else the global script scope.  Routine
        calls are lexically scoped like the reference (var_scope.sql:
        a callee does NOT see its caller's locals, only globals)."""
        return self.local_stack[-1] if self.local_stack else self.vars

    def write_var(self, name: str, value) -> None:
        """Assignment: an existing local wins, then the enclosing
        package's variable, then an existing global, else a new variable
        in the current scope."""
        if self.local_stack and name in self.local_stack[-1]:
            self.local_stack[-1][name] = value
            return
        if self.pkg_stack and self.pkg_stack[-1]:
            q = f"{self.pkg_stack[-1]}.{name}"
            if q in self.vars:
                self.vars[q] = value
                return
        if name in self.vars:
            self.vars[name] = value
            return
        self.scope()[name] = value

    def read_var(self, name: str, default=None):
        if self.local_stack and name in self.local_stack[-1]:
            return True, self.local_stack[-1][name]
        if self.pkg_stack and self.pkg_stack[-1]:
            q = f"{self.pkg_stack[-1]}.{name}"
            if q in self.vars:
                return True, self.vars[q]
        if name in self.vars:
            return True, self.vars[name]
        return False, default

    def resolve_routine(self, name: str) -> Optional[str]:
        """Routine lookup incl. the enclosing package's namespace."""
        if name in self.routines:
            return name
        if self.pkg_stack:
            q = f"{self.pkg_stack[-1]}.{name}"
            if q in self.routines:
                return q
        return None

    def call_routine(self, name: str, arg_exprs: list):
        r = self.routines.get(name)
        if r is None:
            raise NameError(f"HPL/SQL: no procedure or function {name!r}")
        out_bindings: list[tuple[str, str]] = []  # (param, caller var)
        frame: dict = {}
        for (mode, pname), aexpr in zip(r.params, arg_exprs):
            if mode in ("out", "inout") and aexpr[0] == "var":
                out_bindings.append((pname, aexpr[1]))
            frame[pname] = None if mode == "out" else self.eval(aexpr)
        # a fresh LEXICAL scope: the callee sees globals and its own
        # locals, never the caller's locals (var_scope.sql semantics)
        self.local_stack.append(frame)
        self.pkg_stack.append(r.pkg)
        ret = None
        try:
            self.exec_stmt(r.body)
        except _Return as e:
            ret = e.value
        finally:
            self.pkg_stack.pop()
            self.local_stack.pop()
        for pname, caller_var in out_bindings:
            self.write_var(caller_var, frame.get(pname))
        return ret

    # -- expression evaluation
    def eval(self, e) -> Any:
        kind = e[0]
        if kind == "lit":
            return e[1]
        if kind == "date_lit":
            return _parse_date(e[1])
        if kind == "timestamp_lit":
            return _parse_timestamp(e[1])
        if kind == "interval_of":
            import datetime as _dt

            n = self.eval(e[1])
            return _Interval(_dt.timedelta(**{e[2]: float(n)}))
        if kind == "cast":
            return self.eval_cast(self.eval(e[1]), e[2], e[3])
        if kind == "var":
            name = e[1]
            found, val = self.read_var(name)
            if found:
                return val
            rn = self.resolve_routine(name)
            if rn is not None and self.routines[rn].is_func:
                return self.call_routine(rn, [])
            # reference semantics: an unresolved identifier evaluates to
            # NULL (var_scope.out.txt shows 'j: ' for an out-of-scope
            # local), not an error
            return None
        if kind == "neg":
            v = self.eval(e[1])
            return None if v is None else -v
        if kind == "bin":
            return self.binop(e[1], self.eval(e[2]), self.eval(e[3]))
        if kind == "cmp":
            return self.cmpop(e[1], self.eval(e[2]), self.eval(e[3]))
        if kind == "between":
            v, lo, hi = self.eval(e[1]), self.eval(e[2]), self.eval(e[3])
            if v is None or lo is None or hi is None:
                return None
            return lo <= v <= hi
        if kind == "isnull":
            neg, sub = e[1], e[2]
            isn = self.eval(sub) is None
            return (not isn) if neg else isn
        if kind == "and":
            left = self.eval(e[1])
            if left is False:
                return False
            right = self.eval(e[2])
            if left is None or right is None:
                return False if right is False else None
            return self.truthy(left) and self.truthy(right)
        if kind == "or":
            left = self.eval(e[1])
            if self.truthy(left):
                return True
            right = self.eval(e[2])
            if left is None or right is None:
                return True if self.truthy(right) else None
            return self.truthy(right)
        if kind == "not":
            v = self.eval(e[1])
            return None if v is None else not self.truthy(v)
        if kind == "case":
            _, subject, whens, default = e
            if subject is not None:
                sv = self.eval(subject)
                for c, val in whens:
                    if self.cmpop("=", sv, self.eval(c)) is True:
                        return self.eval(val)
            else:
                for c, val in whens:
                    if self.truthy(self.eval(c)):
                        return self.eval(val)
            return self.eval(default)
        if kind == "fn":
            return self.call_fn(e[1], e[2])
        if kind == "cursor_attr":
            cur = self.cursor(e[1])
            attr = e[2]
            if attr == "isopen":
                return cur.is_open
            if attr == "found":
                return cur.found
            if attr == "notfound":
                return None if cur.found is None else not cur.found
            if attr == "rowcount":
                return cur.fetched
        raise NotImplementedError(f"HPL/SQL expression {kind}")

    def cursor(self, name: str) -> Cursor:
        if name not in self.cursors:
            raise NameError(f"HPL/SQL: unknown cursor {name!r}")
        return self.cursors[name]

    @staticmethod
    def truthy(v) -> bool:
        return bool(v) and v is not None

    @staticmethod
    def binop(op: str, a, b):
        import datetime as dt

        if op == "||":
            # Oracle-style concat: a NULL operand acts as an empty string
            # unless ALL operands are NULL (expr.sql: null||null → null)
            if a is None and b is None:
                return None
            sa = "" if a is None else HplsqlInterpreter.fmt(a)
            sb = "" if b is None else HplsqlInterpreter.fmt(b)
            return sa + sb
        if a is None or b is None:
            return None
        # date/timestamp arithmetic: ± INTERVAL, ± int days (add.sql)
        if isinstance(b, _Interval) and isinstance(a, (dt.date, dt.datetime, _Ts)):
            if op == "+":
                return a + b.delta
            if op == "-":
                return a - b.delta
            raise NotImplementedError(f"date {op} interval")
        if isinstance(a, (dt.date, dt.datetime, _Ts)) and isinstance(b, int):
            return a + dt.timedelta(days=b) if op == "+" else a - dt.timedelta(days=b)
        if isinstance(b, (dt.date, dt.datetime, _Ts)) and isinstance(a, int) and op == "+":
            return b + dt.timedelta(days=a)
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b
        if op == "%":
            return a % b
        raise NotImplementedError(op)

    @staticmethod
    def cmpop(op: str, a, b):
        if a is None or b is None:
            return None
        if isinstance(a, bool) or isinstance(b, bool):
            a, b = bool(a), bool(b)
        elif isinstance(a, (int, float, Decimal)) != isinstance(b, (int, float, Decimal)):
            # numeric-vs-string comparison coerces to string (Hive loose)
            a, b = str(a), str(b)
        if op in ("=", "=="):
            return a == b
        if op in ("<>", "!="):
            return a != b
        if op == "<":
            return a < b
        if op == ">":
            return a > b
        if op == "<=":
            return a <= b
        if op == ">=":
            return a >= b
        raise NotImplementedError(op)

    @staticmethod
    def fmt(v) -> str:
        import datetime as dt

        if v is None:
            return "null"
        if v is True:
            return "true"
        if v is False:
            return "false"
        if isinstance(v, float) and v.is_integer():
            return str(int(v))
        if isinstance(v, _Ts):
            base = v.dt.strftime("%Y-%m-%d %H:%M:%S")
            if v.scale and v.dt.microsecond:
                base += f".{v.dt.microsecond // 1000:03d}"
            return base
        if isinstance(v, dt.datetime):
            base = v.strftime("%Y-%m-%d %H:%M:%S")
            if v.microsecond:
                base += f".{v.microsecond // 1000:03d}"
            return base
        if isinstance(v, dt.date):
            return v.isoformat()
        return str(v)

    def eval_cast(self, v, typ: str, prec: Optional[int]):
        if v is None:
            return None
        if typ in ("char", "varchar", "varchar2", "string"):
            s = self.fmt(v)
            return s[:prec] if prec is not None else s
        if typ in ("int", "integer", "bigint", "smallint", "tinyint"):
            return int(float(v)) if not isinstance(v, int) else v
        if typ in ("float", "double", "dec", "decimal", "number", "numeric"):
            return float(v)
        if typ == "date":
            return _parse_date(self.fmt(v)[:10])
        if typ == "timestamp":
            return _parse_timestamp(self.fmt(v))
        raise NotImplementedError(f"CAST AS {typ}")

    # -- builtin functions (GenericUDF-compatible local forms)
    def call_fn(self, name: str, arg_exprs: list):
        rn = self.resolve_routine(name)
        if rn is not None:
            return self.call_routine(rn, arg_exprs)
        args = [self.eval(a) for a in arg_exprs]
        if name == "dbms_output.put_line":  # statement-style: prints, no value
            self.output.append(self.fmt(args[0]) if args else "")
            return _SILENT
        if name == "concat":  # Hive CONCAT skips NULLs in hplsql (concat.sql)
            vals = [self.fmt(a) for a in args if a is not None]
            return "".join(vals) if vals else None
        if name in ("nvl", "ifnull", "isnull_fn"):
            # hplsql's NVL is N-ary first-non-null (nvl.sql)
            for a in args:
                if a is not None:
                    return a
            return None
        if name == "nvl2":
            return args[1] if args[0] is not None else args[2]
        if name == "coalesce":
            for a in args:
                if a is not None:
                    return a
            return None
        if name == "decode":
            subject = args[0]
            pairs, default = args[1:], None
            if len(pairs) % 2 == 1:
                default = pairs[-1]
                pairs = pairs[:-1]
            for i in range(0, len(pairs), 2):
                if subject == pairs[i] or (subject is None and pairs[i] is None):
                    return pairs[i + 1]
            return default
        if name == "upper":
            return None if args[0] is None else str(args[0]).upper()
        if name == "lower":
            return None if args[0] is None else str(args[0]).lower()
        if name == "length":
            return None if args[0] is None else len(str(args[0]))
        if name == "len":  # T-SQL LEN: trailing blanks excluded (len.sql)
            return None if args[0] is None else len(str(args[0]).rstrip())
        if name in ("substr", "substring"):
            s = args[0]
            if s is None:
                return None
            s = str(s)
            start = int(args[1])
            idx = start - 1 if start > 0 else len(s) + start
            if len(args) > 2:
                return s[idx : idx + int(args[2])]
            return s[idx:]
        if name == "instr":
            # Oracle INSTR(str, sub[, pos[, occurrence]]) incl. negative
            # pos = backward search (instr.sql battery)
            if args[0] is None or args[1] is None:
                return None
            s, sub = str(args[0]), str(args[1])
            pos = int(args[2]) if len(args) > 2 else 1
            occ = int(args[3]) if len(args) > 3 else 1
            starts, i = [], s.find(sub)
            while i != -1:
                starts.append(i)
                i = s.find(sub, i + 1)
            if pos >= 0:
                cands = [p for p in starts if p >= pos - 1]
            else:
                cands = [p for p in starts if p <= len(s) + pos][::-1]
            return cands[occ - 1] + 1 if occ <= len(cands) else 0
        if name == "trim":
            return None if args[0] is None else str(args[0]).strip()
        if name == "replace":
            if args[0] is None:
                return None
            return str(args[0]).replace(str(args[1]), str(args[2]))
        if name == "abs":
            return None if args[0] is None else abs(args[0])
        if name == "mod":
            if args[0] is None or args[1] is None:
                return None
            return args[0] % args[1]
        if name == "char":  # value → string (char.sql, float.sql)
            return None if args[0] is None else self.fmt(args[0])
        if name == "to_char":
            # single-arg form: default string conversion (to_char.sql)
            return None if args[0] is None else self.fmt(args[0])
        if name == "date":
            v = args[0]
            if v is None:
                return None
            return _parse_date(self.fmt(v)[:10])
        if name == "timestamp_iso":
            return None if args[0] is None else _parse_timestamp(self.fmt(args[0]))
        if name == "to_timestamp":
            if args[0] is None:
                return None
            if len(args) == 1:
                return _parse_timestamp(self.fmt(args[0]))
            import datetime as _dt

            # Oracle-style picture → strptime (to_timestamp.sql)
            fmt = args[1]
            for pat, rep in (
                ("YYYY", "%Y"), ("yyyy", "%Y"), ("MM", "%m"), ("mm", "%m"),
                ("DD", "%d"), ("dd", "%d"), ("HH24", "%H"), ("hh24", "%H"),
                ("MI", "%M"), ("mi", "%M"), ("SS", "%S"), ("ss", "%S"),
            ):
                fmt = fmt.replace(pat, rep)
            parsed = _dt.datetime.strptime(str(args[0]), fmt)
            scale = 3 if "%S" in fmt else 0
            return _Ts(parsed, scale)
        if name == "current_date" or name == "sysdate":
            raise NameError(
                "HPL/SQL: current_date/sysdate are non-deterministic — "
                "query the engine (SELECT current_date) instead"
            )
        # unknown → engine semantics win (one-row SELECT fallback)
        if self.engine is None:
            raise NameError(f"HPL/SQL: unknown function {name!r} (no engine)")
        lits = ", ".join(self.to_sql_literal(a) for a in args)
        df = self.sql(f"SELECT {name}({lits})")
        return df.collect()[0][0]

    @staticmethod
    def to_sql_literal(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(v)
        return "'" + str(v).replace("'", "''") + "'"

    # -- SQL bridge with :var / var substitution for known variables
    def sql(self, text: str):
        if self.engine is None:
            raise RuntimeError("HPL/SQL: SQL statement needs an engine")
        # substitute scalar variables referenced by bare name (hplsql
        # binds known identifiers; we replace whole-word matches only)
        def repl(m: "re.Match[str]") -> str:
            name = m.group(0).lower()
            found, val = self.read_var(name)
            if found and not isinstance(val, (list, tuple)):
                return self.to_sql_literal(val)
            return m.group(0)

        bound = re.sub(r"\b[A-Za-z_][\w]*\b", repl, text)
        return self.engine.sql(bound)


def run_script(src: str, engine: Any = None) -> list[str]:
    """Convenience: run an HPL/SQL script, return its PRINT output."""
    return HplsqlInterpreter(engine=engine).run(src)
