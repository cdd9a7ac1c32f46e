#!/usr/bin/env python3
"""Repo leak scan -> LEAKCHECK.json (round-stamped).

Mirrors the driver's seven hit categories so close_round.sh can commit a
self-consistent, current-round LEAKCHECK record (the round-15 residual:
close_round.sh regenerated TEST/CORRECTNESS/BENCH but left LEAKCHECK at
the prior round's content). Patterns are assembled at runtime from
fragments so this scanner never matches itself.

Usage: tools/leakcheck.py <round-number>
"""
import json
import re
import subprocess
import sys

ROUND = int(sys.argv[1])

# Assemble needles from fragments (never written contiguously here).
A = "anthro" + "pic"
CLD = "cla" + "ude"


def rx(*parts: str) -> re.Pattern:
    return re.compile("".join(parts), re.IGNORECASE)


CATEGORIES = {
    # imports / package refs of internal or provider SDKs
    "internal-import": rx(r"(^|\s)(import\s+", A, r"|from\s+", A, r"\s+import|@", A, r"-ai/)"),
    # internal package/repo names
    "internal-pkg2": rx(CLD, r"-(cli|code)-internal|", A, r"s/", CLD),
    # internal URLs / shortlinks. The shortlink form must not be preceded
    # by a path segment or word char (ordinary relative paths like
    # "cmd/go/main" or prose like "go/no-go" are not shortlinks), so it
    # anchors on a true token start instead of \b.
    "internal-url": rx(
        r"https?://[\w.-]*", A, r"\.com|(?<![\w/.-])go/[a-z][\w-]{1,30}\b(?!/)"
    ),
    # cloud buckets that look internal
    "internal-bucket": rx(r"(s3|gs)://[\w.-]*(", A, "|", CLD, r")[\w.-]*"),
    # slack archives / channels
    "slack-link": rx(r"slack\.com/archives|#", CLD, r"-code-"),
    # credential shapes
    "api-key": rx(r"sk-", "ant", r"-[A-Za-z0-9_-]{8,}|AKIA[0-9A-Z]{16}"),
    # internal env-var families
    "axon-env": rx(r"\bAXON_[A-Z0-9_]+\b"),
}

# Tracked text files only; this scanner and the JSON it writes are excluded.
files = subprocess.run(
    ["git", "ls-files"], capture_output=True, text=True, check=True
).stdout.splitlines()
SKIP = {"tools/leakcheck.py", "LEAKCHECK.json"}
# Exact matched tokens that are ordinary English/engineering idiom, not
# shortlinks — a single prose false positive hard-aborts close_round.sh.
BENIGN = {"go/no-go", "go/nogo"}
hits: dict[str, list[str]] = {k: [] for k in CATEGORIES}
for f in files:
    if f in SKIP or f.endswith((".parquet", ".png", ".jpg", ".h5", ".tfrecord")):
        continue
    try:
        text = open(f, encoding="utf-8", errors="ignore").read()
    except (IsADirectoryError, FileNotFoundError):
        continue
    for ln, line in enumerate(text.splitlines(), 1):
        for cat, pat in CATEGORIES.items():
            m = pat.search(line)
            # BENIGN applies ONLY to the shortlink half of internal-url —
            # it exists for prose like "go/no-go"; letting it suppress any
            # other category's full match would silently drop a real hit
            # whose text happened to equal a benign token.
            if m and not (cat == "internal-url" and m.group(0).lower() in BENIGN):
                hits[cat].append(f"{f}:{ln}: {line.strip()[:160]}")

record = {
    "round": ROUND,
    "n_hits": sum(len(v) for v in hits.values()),
    "hits": hits,
}
with open("LEAKCHECK.json", "w") as out:
    json.dump(record, out, indent=2)
print(f"[leakcheck] round {ROUND}: {record['n_hits']} hits")
if record["n_hits"]:
    for cat, v in hits.items():
        for h in v[:5]:
            print(f"  {cat}: {h}")
    sys.exit(1)
