"""HPL/SQL interpreter parity pins.

Each script is adapted from the reference's hplsql local test corpus
(hplsql/src/test/queries/local/*.sql) with expected PRINT streams
matching the golden .out.txt files' print lines (trace lines excluded);
provenance cited per test.  Pure-procedural scripts run with no engine
at all — the reference's Exec.java likewise evaluates locally — while
cursor/SQL tests bind the real Spark engine.
"""

import pytest

from apache_hive_2_1_1_src_spark.hplsql import HplsqlInterpreter, run_script


def test_if_elsif_else_between():
    # adapted from queries/local/if.sql (standard-form branches)
    out = run_script(
        """
        DECLARE state VARCHAR;
        DECLARE count INT;
        SET state = 'CA';
        SET count = 1;
        IF count = 1 THEN PRINT 'True block - Correct'; END IF;
        IF state = 'CA' THEN PRINT 'True block - Correct';
        ELSE PRINT 'False block - Incorrect'; END IF;
        IF state = 'MA' THEN PRINT 'True block - Incorrect';
        ELSE PRINT 'False block - Correct'; END IF;
        IF count = 4 THEN PRINT 'A';
        ELSIF count = 3 THEN PRINT 'B';
        ELSIF count = 2 THEN PRINT 'C';
        ELSE PRINT 'False block - Correct'; END IF;
        IF count = 3 THEN PRINT 'A';
        ELSIF count = 1 THEN PRINT 'True block - Correct';
        ELSE PRINT 'D'; END IF;
        IF 1 IS NOT NULL AND 1 BETWEEN 0 AND 100 THEN
          PRINT 'True block - Correct';
        ELSE PRINT 'E'; END IF;
        """
    )
    assert out == [
        "True block - Correct",
        "True block - Correct",
        "False block - Correct",
        "False block - Correct",
        "True block - Correct",
        "True block - Correct",
    ]


def test_while_loop_and_do_variants():
    # adapted from queries/local/while.sql: LOOP and DO forms count down
    out = run_script(
        """
        DECLARE count INT DEFAULT 3;
        WHILE count <> 0 LOOP
          PRINT count;
          count := count - 1;
        END LOOP;
        SET count = 3;
        WHILE count <> 0 DO
          PRINT count;
          SET count = count - 1;
        END WHILE;
        """
    )
    assert out == ["3", "2", "1", "3", "2", "1"]


def test_for_range_and_reverse_and_scoping():
    # adapted from queries/local/for_range.sql: loop var shadows, the
    # outer i keeps its pre-loop value after END LOOP
    out = run_script(
        """
        DECLARE i INT = 3;
        PRINT i;
        FOR i IN 1..5 LOOP PRINT i; END LOOP;
        PRINT i;
        FOR i IN REVERSE 5..1 LOOP PRINT i; END LOOP;
        """
    )
    assert out == ["3", "1", "2", "3", "4", "5", "3", "5", "4", "3", "2", "1"]


def test_exit_when_and_labeled_exit():
    # adapted from queries/local/exit.sql: EXIT WHEN, plain EXIT breaking
    # one level, EXIT <label> breaking the outer labeled loop
    out = run_script(
        """
        DECLARE count INT DEFAULT 3;
        WHILE 1=1 LOOP
          PRINT 'Start of while block';
          PRINT count;
          count := count - 1;
          EXIT WHEN count = 0;
          PRINT 'End of while block';
        END LOOP;
        <<lbl>>
        WHILE 1=1 LOOP
          PRINT 'Start of outer while block';
          WHILE 1=1 LOOP
            PRINT 'Start of 1st inner while block';
            EXIT;
            PRINT 'NEVER SHOWN';
          END LOOP;
          WHILE 1=1 LOOP
            PRINT 'Start of 2nd inner while block';
            EXIT lbl;
            PRINT 'NEVER SHOWN';
          END LOOP;
          PRINT 'NEVER SHOWN';
        END LOOP;
        """
    )
    assert out == [
        "Start of while block", "3", "End of while block",
        "Start of while block", "2", "End of while block",
        "Start of while block", "1",
        "Start of outer while block",
        "Start of 1st inner while block",
        "Start of 2nd inner while block",
    ]


def test_case_simple_searched_nvl2():
    # adapted from queries/local/case.sql (all six branches → Correct)
    out = run_script(
        """
        PRINT CASE 1 WHEN 0 THEN 'FAILED' WHEN 1 THEN 'Correct'
                     WHEN 2 THEN 'FAILED' ELSE 'FAILED' END
        PRINT CASE 3 WHEN 0 THEN 'FAILED' WHEN 1 THEN 'FAILED'
                     ELSE 'Correct' END
        PRINT NVL2(CASE 3 WHEN 0 THEN 'FAILED' WHEN 1 THEN 'FAILED' END,
                   'FAILED', 'Correct')
        PRINT CASE WHEN 1=0 THEN 'FAILED' WHEN 1=1 THEN 'Correct'
                   ELSE 'FAILED' END
        PRINT CASE WHEN 3=0 THEN 'FAILED' WHEN 3=1 THEN 'FAILED'
                   ELSE 'Correct' END
        PRINT NVL2(CASE WHEN 3=0 THEN 'FAILED' WHEN 3=1 THEN 'FAILED' END,
                   'FAILED', 'Correct')
        """
    )
    assert out == ["Correct"] * 6


def test_concat_null_skipping_and_bare_expression():
    # adapted from queries/local/concat.sql: bare expression statements
    # print their value; CONCAT skips NULLs, all-NULL → NULL
    out = run_script(
        """
        CONCAT('a', 'b', NULL, 'c');
        NVL(CONCAT(NULL, NULL, NULL), 'NULL Value');
        """
    )
    assert out == ["abc", "NULL Value"]


def test_assignment_forms():
    # adapted from queries/local/assign.sql: :=, bare =, SET multi, tuple
    out = run_script(
        """
        DECLARE code VARCHAR; DECLARE status INT; DECLARE count INT;
        DECLARE limit INT;
        code := 'A';
        status := 1;
        count = 0;
        PRINT code; PRINT status; PRINT count;
        SET code = 'B', status = 2;
        SET (count, limit) = (10, 100);
        PRINT code; PRINT status; PRINT count; PRINT limit;
        """
    )
    assert out == ["A", "1", "0", "B", "2", "10", "100"]


def test_create_procedure_with_out_param():
    # adapted from queries/local/create_procedure.sql
    out = run_script(
        """
        CREATE PROCEDURE set_message(IN name STRING, OUT result STRING)
        BEGIN
          SET result = 'Hello, ' || name || '!';
        END;
        DECLARE str STRING;
        CALL set_message('world', str);
        PRINT str;
        """
    )
    assert out == ["Hello, world!"]


def test_create_function_return_stops_execution():
    # adapted from queries/local/create_function.sql: statements after
    # RETURN must not run; function callable from expressions
    out = run_script(
        """
        CREATE FUNCTION hello()
          RETURNS STRING
        BEGIN
          PRINT 'Start';
          RETURN 'Hello, world';
          PRINT 'Must not be printed';
        END;
        PRINT hello() || '!';
        PRINT 'End of script';
        """
    )
    assert out == ["Start", "Hello, world!", "End of script"]


def test_exception_handler():
    # adapted from queries/local/exception.sql: a failing statement
    # (FETCH on an undeclared cursor, as the reference script uses)
    # inside BEGIN routes to EXCEPTION WHEN OTHERS THEN
    out = run_script(
        """
        DECLARE v STRING;
        BEGIN
          PRINT 'Correct';
          FETCH no_such_cursor INTO v;
          PRINT 'Incorrect - unreachable';
        EXCEPTION WHEN OTHERS THEN
          PRINT 'Correct - Exception raised';
        END
        """
    )
    assert out == ["Correct", "Correct - Exception raised"]


def test_undefined_variable_is_null():
    # reference semantics (var_scope.out.txt): an unresolved identifier
    # evaluates to NULL, so concat shows an empty tail
    out = run_script("PRINT 'j: ' || j_not_declared;")
    assert out == ["j: "]


def test_callee_does_not_see_caller_locals():
    # var_scope.sql semantics: lexical, not dynamic, scoping
    out = run_script(
        """
        DECLARE i INT = 3;
        CREATE PROCEDURE p1()
        BEGIN
          PRINT 'i: ' || i;
          PRINT 'j: ' || j;
        END;
        CREATE PROCEDURE p2()
        BEGIN
          DECLARE j INT = 5;
          PRINT 'j: ' || j;
          CALL p1();
        END;
        CALL p2();
        PRINT 'j: ' || j;
        """
    )
    assert out == ["j: 5", "i: 3", "j: ", "j: "]


def test_decode_and_builtins():
    # adapted from queries/local/decode.sql + string function batteries
    out = run_script(
        """
        DECLARE a INT = 1;
        PRINT DECODE(a, 1, 'one', 2, 'two', 'other');
        PRINT DECODE(3, 1, 'one', 2, 'two', 'other');
        PRINT DECODE(NULL, NULL, 'null match', 'other');
        PRINT UPPER('ab') || LOWER('CD');
        PRINT LENGTH('hello');
        PRINT SUBSTR('abcdef', 2, 3);
        PRINT INSTR('abcabc', 'b');
        PRINT MOD(7, 3);
        """
    )
    assert out == ["one", "other", "null match", "ABcd", "5", "bcd", "2", "1"]


def test_arithmetic_and_null_propagation():
    out = run_script(
        """
        DECLARE x INT = 10;
        PRINT x + 5; PRINT x - 5; PRINT x * 2; PRINT x / 4; PRINT x % 3;
        PRINT NVL(NULL + 1, 'null arith');
        PRINT 1 = 1; PRINT 1 <> 1;
        """
    )
    assert out == ["15", "5", "20", "2.5", "1", "null arith", "true", "false"]


def test_continue_statement():
    out = run_script(
        """
        FOR i IN 1..5 LOOP
          IF i % 2 = 0 THEN CONTINUE; END IF;
          PRINT i;
        END LOOP;
        """
    )
    assert out == ["1", "3", "5"]


# ---------------------------------------------------------- engine-bound
@pytest.fixture()
def engine(spark, sf_dir):
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    return eng


def test_cursor_for_loop(engine):
    # adapted from the cursor-loop pattern in queries/db: iterate a
    # query's rows binding rec.col names
    interp = HplsqlInterpreter(engine=engine)
    interp.run(
        """
        DECLARE total INT = 0;
        FOR rec IN (SELECT r_regionkey, r_name FROM region
                    ORDER BY r_regionkey) LOOP
          PRINT rec.r_name;
          SET total = total + rec.r_regionkey;
        END LOOP;
        PRINT total;
        """
    )
    assert interp.output[-1] == "10"  # 0+1+2+3+4
    assert len(interp.output) == 6


def test_select_into(engine):
    out = run_script(
        """
        DECLARE cnt INT; DECLARE mx INT;
        SELECT COUNT(*), MAX(r_regionkey) INTO cnt, mx FROM region;
        PRINT 'count=' || cnt;
        PRINT 'max=' || mx;
        """,
        engine=engine,
    )
    assert out == ["count=5", "max=4"]


def test_execute_immediate_and_variable_binding(engine):
    out = run_script(
        """
        DECLARE k INT = 2;
        DECLARE nm STRING;
        SELECT r_name INTO nm FROM region WHERE r_regionkey = k;
        PRINT nm;
        EXECUTE IMMEDIATE 'SELECT COUNT(*) AS n FROM nation';
        """,
        engine=engine,
    )
    assert len(out) == 1 and isinstance(out[0], str) and out[0]


def test_unknown_function_falls_back_to_engine(engine):
    # repeat() is not in the local builtin catalog — engine evaluates it
    out = run_script("PRINT REPEAT('ab', 3);", engine=engine)
    assert out == ["ababab"]


def test_cursor_open_fetch_close_attributes(engine):
    # adapted from queries/db/cursor_attributes.sql: %ISOPEN before/after
    # OPEN, %FOUND/%NOTFOUND NULL before first FETCH, flipping after the
    # rows are exhausted; DBMS_OUTPUT.PUT_LINE prints without echoing a
    # statement value
    out = run_script(
        """
        DECLARE CURSOR c1 IS SELECT r_name FROM region
                             WHERE r_regionkey = 0 ORDER BY r_name;
        DECLARE v1 VARCHAR;
        BEGIN
          IF c1%ISOPEN THEN DBMS_OUTPUT.PUT_LINE('%ISOPEN failed');
          ELSE DBMS_OUTPUT.PUT_LINE('%ISOPEN correct'); END IF;
          OPEN c1;
          IF c1%ISOPEN THEN DBMS_OUTPUT.PUT_LINE('%ISOPEN correct');
          ELSE DBMS_OUTPUT.PUT_LINE('%ISOPEN failed'); END IF;
          IF c1%FOUND IS NULL THEN DBMS_OUTPUT.PUT_LINE('%FOUND correct');
          ELSE DBMS_OUTPUT.PUT_LINE('%FOUND failed'); END IF;
          IF c1%NOTFOUND IS NULL THEN DBMS_OUTPUT.PUT_LINE('%NOTFOUND correct');
          ELSE DBMS_OUTPUT.PUT_LINE('%NOTFOUND failed'); END IF;
          FETCH c1 INTO v1;
          IF c1%FOUND THEN DBMS_OUTPUT.PUT_LINE('%FOUND correct');
          ELSE DBMS_OUTPUT.PUT_LINE('%FOUND failed'); END IF;
          IF c1%NOTFOUND THEN DBMS_OUTPUT.PUT_LINE('%NOTFOUND failed');
          ELSE DBMS_OUTPUT.PUT_LINE('%NOTFOUND correct'); END IF;
          FETCH c1 INTO v1;
          IF c1%FOUND THEN DBMS_OUTPUT.PUT_LINE('%FOUND failed');
          ELSE DBMS_OUTPUT.PUT_LINE('%FOUND correct'); END IF;
          IF c1%NOTFOUND THEN DBMS_OUTPUT.PUT_LINE('%NOTFOUND correct');
          ELSE DBMS_OUTPUT.PUT_LINE('%NOTFOUND failed'); END IF;
          CLOSE c1;
        END
        """,
        engine=engine,
    )
    assert out == [
        "%ISOPEN correct", "%ISOPEN correct", "%FOUND correct",
        "%NOTFOUND correct", "%FOUND correct", "%NOTFOUND correct",
        "%FOUND correct", "%NOTFOUND correct",
    ]


def test_cursor_fetch_loop_rowcount(engine):
    # classic FETCH-loop pattern: EXIT WHEN c%NOTFOUND, %ROWCOUNT tracks
    # fetched rows
    out = run_script(
        """
        DECLARE CURSOR c IS SELECT n_name FROM nation
                            WHERE n_regionkey = 1 ORDER BY n_name;
        DECLARE nm STRING;
        OPEN c;
        WHILE 1=1 LOOP
          FETCH c INTO nm;
          EXIT WHEN c%NOTFOUND;
          PRINT nm;
        END LOOP;
        PRINT 'rows=' || c%ROWCOUNT;
        CLOSE c;
        """,
        engine=engine,
    )
    assert out[-1] == "rows=5"
    assert len(out) == 6 and out[:5] == sorted(out[:5])


def test_fetch_unopened_cursor_raises_into_handler(engine):
    out = run_script(
        """
        DECLARE CURSOR c IS SELECT r_name FROM region;
        DECLARE v STRING;
        BEGIN
          FETCH c INTO v;
          PRINT 'unreachable';
        EXCEPTION WHEN OTHERS THEN
          PRINT 'Correct - Exception raised';
        END
        """,
        engine=engine,
    )
    assert out == ["Correct - Exception raised"]


def test_syntax_errors_raise_with_line():
    import pytest as _pytest

    with _pytest.raises(SyntaxError, match="unexpected end"):
        run_script("IF 1 = 1 THEN PRINT 'x';")  # unterminated IF
    with _pytest.raises(SyntaxError):
        run_script("WHILE 1=1 PRINT 'x'; END LOOP;")  # missing LOOP/DO


def test_unknown_procedure_call_raises():
    import pytest as _pytest

    with _pytest.raises(NameError, match="no_such_proc"):
        run_script("CALL no_such_proc(1);")


def test_exit_unknown_label_propagates():
    # EXIT lbl with no enclosing <<lbl>> loop must escape, not silently
    # terminate the wrong loop
    import pytest as _pytest

    with _pytest.raises(Exception):
        run_script("WHILE 1=1 LOOP EXIT missing_label; END LOOP;")


def test_cmp_row_count(engine):
    # adapted from queries/db/cmp_row_count.sql: table, WHERE-narrowed,
    # and subquery operands; the AT <conn> clause maps to this engine
    out = run_script(
        """
        CMP ROW_COUNT region, region AT hive2conn;
        CMP ROW_COUNT region WHERE 1=1, region;
        CMP ROW_COUNT (SELECT r_name FROM region), nation WHERE n_regionkey = 0;
        """,
        engine=engine,
    )
    assert out == ["row_count\t5\t5", "row_count\t5\t5", "row_count\t5\t5"]


def test_copy_to_table(engine, spark):
    # adapted from queries/db/copy_to_table.sql
    spark.sql("DROP TABLE IF EXISTS hpl_copy_dest")
    out = run_script(
        """
        COPY (SELECT r_regionkey, r_name FROM region) TO hpl_copy_dest;
        CMP ROW_COUNT region, hpl_copy_dest;
        """,
        engine=engine,
    )
    assert out == ["row_count\t5\t5"]
    assert spark.table("hpl_copy_dest").count() == 5
    spark.sql("DROP TABLE IF EXISTS hpl_copy_dest")


def test_cmp_sum(engine, spark):
    # adapted from queries/db/cmp_sum.sql: per-column checksum battery —
    # numeric columns sum, string columns sum their lengths
    spark.sql("DROP TABLE IF EXISTS hpl_cmp_dest")
    out = run_script(
        """
        COPY (SELECT r_regionkey, r_name FROM region) TO hpl_cmp_dest;
        CMP SUM region WHERE 1=1, hpl_cmp_dest;
        """,
        engine=engine,
    )
    assert len(out) == 2  # r_regionkey (numeric sum) + r_name (length sum)
    for line in out:
        col, v1, v2 = line.split("\t")
        assert v1 == v2, line
    spark.sql("DROP TABLE IF EXISTS hpl_cmp_dest")
