#!/usr/bin/env python3
"""Extract the SQL corpus from the reference's QueryParserTest.java.

Reads the Java source (simple string-literal concatenations), resolves
each `String sqlN = ...;` assignment and each inline parseQuery("...")
literal, and records which parse entry point it was fed to:
  - parseQuery(...)                      -> expect "ok"
  - parseQueryThatShouldFail(...)        -> expect "fail"
  - parseQueryThatShouldFailWithSQLException(...) -> expect "fail"
Inline try { parseQuery(sql); fail(); } negatives resolve to "fail" via
the per-test scan for fail() following the call.

Output: src/test/resources/parser_corpus.json
  [{"test": <java test name>, "sql": <sql>, "expect": "ok"|"fail"}]
"""
import json, re, sys

SRC = "/root/reference/phoenix-core/src/test/java/org/apache/phoenix/parse/QueryParserTest.java"
OUT = "src/test/resources/parser_corpus.json"

java = open(SRC).read()

def unescape(s: str) -> str:
    return (s.replace("\\n", "\n").replace("\\t", "\t")
             .replace('\\"', '"').replace("\\\\", "\\"))

STR = re.compile(r'"((?:[^"\\]|\\.)*)"')

def join_literals(expr: str) -> str:
    return "".join(unescape(m) for m in STR.findall(expr))

entries = []
# walk per test method so negatives (try/fail blocks) resolve correctly
tests = re.split(r'@Test\s*\n\s*public void ', java)[1:]
for body in tests:
    name = body.split("(", 1)[0]
    # variable assignments: String sqlN = <expr> ;
    env = {}
    for m in re.finditer(r'String\s+(\w+)\s*=\s*((?:[^;]|\n)*?);', body):
        env[m.group(1)] = join_literals(m.group(2))
    # calls, in order
    for m in re.finditer(
            r'(parseQueryThatShouldFailWithSQLException|'
            r'parseQueryThatShouldFail|parseQuery)\s*\(\s*'
            r'([^;]*?)\)\s*;', body):
        fn, arg = m.group(1), m.group(2)
        argname = arg.split(",")[0].strip()
        if argname in env:
            sql = env[argname]
        elif argname.startswith('"') or "+" in arg:
            sql = join_literals(arg)
        else:
            continue  # e.g. parseQuery(stmt.toString()) round-trips
        if not sql.strip():
            continue
        expect = "fail" if fn != "parseQuery" else "ok"
        # inline negatives: parseQuery(sql) directly followed by fail()
        if expect == "ok":
            tail = body[m.end():m.end() + 40]
            if re.match(r'\s*fail\(', tail):
                expect = "fail"
        entries.append({"test": name, "sql": sql, "expect": expect})

# testUnicodeSpace builds its SQL with Joiner over U+2002 (EN space) —
# the only non-literal construction in the file; reconstruct it directly
entries = [e for e in entries if e["test"] != "testUnicodeSpace"]
entries.append({"test": "testUnicodeSpace",
                "sql": " ".join(["SELECT", "*", "FROM", "T"]),
                "expect": "ok"})

# de-dup identical (sql, expect) pairs, keep first test name
seen, out = set(), []
for e in entries:
    key = (e["sql"], e["expect"])
    if key in seen:
        continue
    seen.add(key)
    out.append(e)

json.dump(out, open(OUT, "w"), indent=1)
ok = sum(1 for e in out if e["expect"] == "ok")
print(f"{len(out)} cases ({ok} ok, {len(out)-ok} fail) -> {OUT}")
