#!/usr/bin/env python3
"""Public-knowledge leak scan with PROVENANCE.

Scans every tracked source/doc file for markers that must never appear in
a from-public-knowledge repo (private endpoints, cloud buckets, chat
permalinks, API-key shapes, short-links, non-public imports) and writes
LEAKCHECK.json including the scanned-file count, total bytes, and a UTC
run timestamp — so a round bump in the file provably corresponds to a
fresh scan (round-5/6 advice: the hit lists alone carry no provenance).

Usage: python3 tools/leakcheck.py [round_number]
Driver-side tooling only — not part of the Scala library.
"""
import datetime
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# every EXTERNAL import root the build can legitimately resolve
# (build.sbt pins the classpath to Spark jars + scalatest/scalacheck;
# any other external coordinate is either a typo or a leak). Imports
# not starting with a TLD-style root (scala/java/local-scope imports
# like `spark.implicits._`) are not external coordinates.
PUBLIC_IMPORT_ROOTS = (
    "org.apache.spark", "org.apache.hadoop", "org.scalatest",
    "org.scalacheck", "com.fasterxml.jackson", "org.apache.logging",
    "com.sun",  # JDK-bundled (test HTTP stub server)
)
EXTERNAL_ROOT = re.compile(r"^(?:com|net|io|dev|co|ai|ml|org|edu)\.")

PATTERNS = {
    "internal-url": re.compile(
        r"https?://[A-Za-z0-9.-]*(?:corp|internal|intranet|staging)"
        r"[A-Za-z0-9.-]*/", re.I),
    "cloud-bucket": re.compile(r"\b(?:s3|gs|abfss?|wasbs?)://[^\s\"']+"),
    "chat-permalink": re.compile(
        r"https?://[A-Za-z0-9.-]*slack\.com/[^\s\"']+", re.I),
    "short-link": re.compile(r"\bgo/[a-z][a-z0-9_-]{2,}\b"),
    "api-key": re.compile(
        r"\b(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|AIza[0-9A-Za-z_-]{35}"
        r"|ghp_[A-Za-z0-9]{36})\b"),
    "secret-env": re.compile(
        r"\b[A-Z_]*(?:SECRET|TOKEN|PASSWORD|API_KEY)[A-Z_]*\s*=\s*\S"),
}


def tracked_files():
    out = subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True,
        check=True).stdout.splitlines()
    keep = []
    for f in out:
        p = REPO / f
        if not p.is_file():
            continue
        if p.suffix in {".scala", ".sbt", ".py", ".md", ".sh", ".json",
                        ".sql", ".properties", ".txt"}:
            keep.append(p)
    return keep


def scan(files):
    hits = {k: [] for k in PATTERNS}
    hits["nonpublic-import"] = []
    n_bytes = 0
    for p in files:
        text = p.read_text(errors="replace")
        n_bytes += len(text)
        rel = str(p.relative_to(REPO))
        for i, line in enumerate(text.splitlines(), 1):
            for name, rx in PATTERNS.items():
                if rx.search(line):
                    hits[name].append(f"{rel}:{i}: {line.strip()[:120]}")
            if p.suffix == ".scala":
                m = re.match(r"\s*import\s+([A-Za-z0-9_.]+)", line)
                if (m and EXTERNAL_ROOT.match(m.group(1)) and not any(
                        m.group(1) == root or m.group(1).startswith(root + ".")
                        for root in PUBLIC_IMPORT_ROOTS)):
                    hits["nonpublic-import"].append(
                        f"{rel}:{i}: {line.strip()[:120]}")
    return hits, n_bytes


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    files = tracked_files()
    hits, n_bytes = scan(files)
    out = {
        "round": rnd,
        "scanned_at_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "n_files_scanned": len(files),
        "n_bytes_scanned": n_bytes,
        "tool": "tools/leakcheck.py",
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (REPO / "LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"scanned {len(files)} files / {n_bytes} bytes; "
          f"{out['n_hits']} hits")
    if out["n_hits"]:
        for k, v in hits.items():
            for h in v:
                print(f"  [{k}] {h}")
        sys.exit(1)


if __name__ == "__main__":
    main()
