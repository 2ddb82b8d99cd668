#!/usr/bin/env python3
"""Self-test for the bench stdout parse contract.

The driver captures the bench command's stdout, keeps the last ~2000
chars, and json-parses the metric line out of that tail. Rounds 6 and 7
both recorded parsed:null even though the line was present and under the
length budget — the sbt "[info] " log prefix broke the raw-line parse.
build.sbt now forces StdoutOutput (no prefix); this tool gates that fix:

    sbt -batch "runMain graft.Bench" > /tmp/bench.out 2>/dev/null
    python3 tools/bench_parse_selftest.py /tmp/bench.out

It replays the driver's exact tail discipline: take the LAST 2000 chars,
split into lines, and require that exactly one line json-parses AS-IS
(column 0, no prefix stripping) into an object with the contract keys.
Exit 0 on success, 1 with a diagnosis otherwise.
"""
import json
import sys

TAIL = 2000
REQUIRED = {"metric", "value", "unit", "queries", "errors", "n_queries", "sf"}


def check(text: str) -> int:
    tail = text[-TAIL:]
    parsed = []
    for line in tail.splitlines():
        line = line.strip("\r")
        if not line.startswith("{"):
            # Diagnose the historical failure mode explicitly.
            if '{"metric"' in line:
                print(f"FAIL: metric line is prefix-bearing (starts {line[:20]!r}) "
                      "- raw json.loads would fail; check build.sbt outputStrategy")
                return 1
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError as e:
            print(f"FAIL: brace-led line in tail does not parse: {e}\n  {line[:120]}")
            return 1
        if isinstance(obj, dict) and "metric" in obj:
            parsed.append(obj)
    if len(parsed) != 1:
        print(f"FAIL: expected exactly 1 parseable metric line in the {TAIL}-char "
              f"tail, found {len(parsed)}")
        return 1
    obj = parsed[0]
    missing = REQUIRED - obj.keys()
    if missing:
        print(f"FAIL: metric line missing contract keys: {sorted(missing)}")
        return 1
    if not isinstance(obj["queries"], dict) or not obj["queries"]:
        print("FAIL: queries map is empty - tail budget dropped every query")
        return 1
    print(f"OK: metric line parses from the {TAIL}-char tail "
          f"(total={obj['value']}s, {obj['n_queries']} queries, "
          f"{len(obj['queries'])} in-line, errors={obj['errors']}, "
          f"load_factor={obj.get('load_factor')})")
    return 0


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    with open(sys.argv[1], "r", errors="replace") as f:
        return check(f.read())


if __name__ == "__main__":
    sys.exit(main())
