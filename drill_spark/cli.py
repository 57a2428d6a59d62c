"""Interactive SQL shell — the drill-embedded / sqlline analog.

The reference launches an embedded drillbit behind a sqlline REPL
(distribution/src/main/resources/drill-embedded:25,
``exec sqlline -u "jdbc:drill:zk=local"``). This module is the same
entry point on the Spark engine: ``python -m drill_spark`` starts a
DrillSession-backed prompt speaking the engine's full SQL dialect
(workspaces, table functions, convert_from, DML, DDL) with sqlline's
core ``!commands`` and output formats.

Non-interactive modes mirror sqlline's: ``-e "query"`` runs one
statement and exits; ``-f script.sql`` runs a ;-separated script.
"""

from __future__ import annotations

import sys
import time

_HELP = """\
!help                 show this help
!tables               list registered tables and views
!schemas              list workspaces / schemas
!columns <table>      list the columns of a table
!describe <table>     alias of !columns
!set <opt> <value>    set a session option (ALTER SESSION analog)
!set outputformat <table|csv|json>   change result rendering
!plan <query>         show the optimized physical plan (EXPLAIN)
!quit / !q / !exit    leave the shell
Any other input is SQL; statements end with ';'."""


def format_table(cols: list[str], rows: list[tuple]) -> str:
    """sqlline-style ASCII grid (+----+-----+ borders)."""
    cells = [[("null" if v is None else str(v)) for v in r] for r in rows]
    widths = [max(len(c), *(len(r[i]) for r in cells)) if cells else len(c)
              for i, c in enumerate(cols)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    def line(vals):
        return "| " + " | ".join(v.ljust(w) for v, w in zip(vals, widths)) + " |"
    out = [sep, line(cols), sep]
    out.extend(line(r) for r in cells)
    out.append(sep)
    return "\n".join(out)


def format_csv(cols: list[str], rows: list[tuple]) -> str:
    import csv
    import io
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(cols)
    for r in rows:
        w.writerow(["" if v is None else v for v in r])
    return buf.getvalue().rstrip("\r\n")


def format_json(cols: list[str], rows: list[tuple]) -> str:
    import json
    return "\n".join(
        json.dumps(dict(zip(cols, r)), default=str) for r in rows)


_FORMATTERS = {"table": format_table, "csv": format_csv, "json": format_json}


class Shell:
    """One REPL over a DrillSession. I/O is injectable for tests."""

    def __init__(self, session=None, out=None, max_rows: int = 10_000):
        self.session = session
        self.out = out if out is not None else sys.stdout
        self.outputformat = "table"
        self.max_rows = max_rows

    def _session(self):
        if self.session is None:
            from drill_spark import DrillSession
            self.session = DrillSession()
        return self.session

    def _print(self, text: str = "") -> None:
        self.out.write(text + "\n")

    def run_sql(self, sql: str) -> None:
        t0 = time.time()
        df = self._session().sql(sql)
        rows = df.limit(self.max_rows + 1).collect()
        truncated = len(rows) > self.max_rows
        rows = rows[: self.max_rows]
        cols = df.columns
        self._print(_FORMATTERS[self.outputformat](cols, [tuple(r) for r in rows]))
        note = " (display capped; use LIMIT)" if truncated else ""
        self._print(f"{len(rows)} row{'s' if len(rows) != 1 else ''} selected "
                    f"({time.time() - t0:.3f} seconds){note}")

    def run_bang(self, line: str) -> bool:
        """Execute one !command; returns False when the shell should
        exit. Errors print and the shell survives."""
        try:
            return self._run_bang(line)
        except Exception as e:
            self._print(f"Error: {_first_line(e)}")
            return True

    def _run_bang(self, line: str) -> bool:
        parts = line[1:].strip().split(None, 1)
        cmd = parts[0].lower() if parts else ""
        arg = parts[1].strip() if len(parts) > 1 else ""
        if cmd in ("quit", "q", "exit"):
            return False
        if cmd == "help":
            self._print(_HELP)
        elif cmd == "tables":
            self.run_sql("select table_schema, table_name, table_type"
                         " from information_schema.`tables` order by 1, 2")
        elif cmd == "schemas":
            self.run_sql("select schema_name from information_schema.schemata"
                         " order by 1")
        elif cmd in ("columns", "describe"):
            if not arg:
                self._print(f"Usage: !{cmd} <table>")
            else:
                self.run_sql(f"describe {arg}")
        elif cmd == "set":
            kv = arg.split(None, 1)
            if len(kv) != 2:
                self._print("Usage: !set <option> <value>")
            elif kv[0].lower() == "outputformat":
                if kv[1] not in _FORMATTERS:
                    self._print(f"unknown format {kv[1]!r}"
                                f" (one of {'/'.join(_FORMATTERS)})")
                else:
                    self.outputformat = kv[1]
            else:
                self._session().set_option(kv[0], kv[1])
        elif cmd == "plan":
            if not arg:
                self._print("Usage: !plan <query>")
            else:
                self._print(self._session().sql(arg)._jdf.queryExecution()
                            .explainString(self._jmode()))
        else:
            self._print(f"unknown command !{cmd} (try !help)")
        return True

    def _jmode(self):
        spark = self._session().spark
        jvm = spark.sparkContext._jvm
        return jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    def feed(self, text: str) -> bool:
        """Process raw input (possibly several ;-separated statements and
        !commands). Returns False when a quit command was seen."""
        buf = ""
        for raw in text.splitlines():
            line = raw.strip()
            if not buf and line.startswith("!"):
                if not self.run_bang(line):
                    return False
                continue
            if not buf and (not line or line.startswith("--")):
                continue
            buf = (buf + "\n" + raw) if buf else raw
            while ";" in buf:
                stmt, buf = buf.split(";", 1)
                if stmt.strip():
                    try:
                        self.run_sql(stmt)
                    except Exception as e:
                        self._print(f"Error: {_first_line(e)}")
        if buf.strip():  # trailing statement without ';'
            try:
                self.run_sql(buf)
            except Exception as e:
                self._print(f"Error: {_first_line(e)}")
        return True

    def repl(self, inp=None) -> None:
        inp = inp if inp is not None else sys.stdin
        interactive = inp is sys.stdin and sys.stdin.isatty()
        self._print('drill_spark shell — "!help" for commands, ";" ends a query')
        buf = ""
        while True:
            if interactive:
                try:
                    raw = input("drill> " if not buf else "    -> ")
                except (EOFError, KeyboardInterrupt):
                    self._print()
                    return
            else:
                raw = inp.readline()
                if not raw:
                    if buf.strip():
                        self.feed(buf)
                    return
                raw = raw.rstrip("\n")
            if not buf and raw.strip().startswith("!"):
                if not self.run_bang(raw.strip()):
                    return
                continue
            buf = (buf + "\n" + raw) if buf else raw
            while ";" in buf:
                stmt, buf = buf.split(";", 1)
                if stmt.strip():
                    try:
                        self.run_sql(stmt)
                    except Exception as e:
                        self._print(f"Error: {_first_line(e)}")


def _first_line(e: Exception) -> str:
    return str(e).strip().split("\n")[0]


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m drill_spark",
        description="drill-embedded-style SQL shell on the Spark engine")
    p.add_argument("-e", "--execute", metavar="SQL",
                   help="run one ;-separated statement list and exit")
    p.add_argument("-f", "--file", metavar="SCRIPT",
                   help="run a SQL script file and exit")
    p.add_argument("--outputformat", choices=sorted(_FORMATTERS),
                   default="table")
    p.add_argument("--fixtures", metavar="DIR",
                   help="register the parquet fixture tables from DIR")
    args = p.parse_args(argv)

    sh = Shell()
    sh.outputformat = args.outputformat
    if args.fixtures:
        sh._session().register_fixture_tables(args.fixtures)
    if args.execute is not None:
        sh.feed(args.execute)
        return 0
    if args.file is not None:
        with open(args.file) as f:
            sh.feed(f.read())
        return 0
    sh.repl()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
