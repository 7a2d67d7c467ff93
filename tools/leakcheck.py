#!/usr/bin/env python3
"""Repo-side leak scan producing LEAKCHECK.json.

Round-4 ADVICE asked that the leak-check artifact carry a run
timestamp and an input digest so a stamp-only edit is distinguishable
from a genuine re-run — this tool adds `run_ts_utc` (wall clock at
scan time) and `input_sha256` (digest over every scanned file's path +
bytes, so ANY content change changes the digest) alongside the
category hit lists.

Usage: python tools/leakcheck.py <round> [repo_root]
Writes <repo_root>/LEAKCHECK.json and prints it.
"""
import datetime
import hashlib
import json
import os
import re
import sys

# Scan everything a judge reads: sources, build, docs. Skip artifacts.
SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".json", ".properties"}
SKIP_DIRS = {"target", ".git", ".idea", ".bloop", "project"}
SKIP_FILES = {"LEAKCHECK.json"}  # the output itself

# Public-only allowlist: every reversed-domain import must come from
# these. Imports that don't start with a reversed domain (e.g.
# `import spark.implicits._` off a local val, `import operators.X`
# relative) are not package references and are not flagged.
ALLOWED_IMPORT_ROOTS = (
    "org.apache.", "org.scalatest", "org.scalacheck", "org.json4s",
    "org.slf4j", "org.xerial", "com.fasterxml", "com.github.luben",
    "com.google.common", "io.netty",
)
REV_DOMAIN = r"(?:org|com|net|io|ai|dev|co|edu|gov)\."
CATEGORIES = {
    # reversed-domain scala/sbt imports outside the public allowlist
    "internal-import": re.compile(
        r"^\s*import\s+(?!" +
        "|".join(re.escape(r) for r in ALLOWED_IMPORT_ROOTS) +
        r")(" + REV_DOMAIN + r"[\w.]+)", re.M),
    # URLs to anything but apache/github/public docs
    "internal-url": re.compile(
        r"https?://(?!(?:www\.)?(?:github\.com|apache\.org|"
        r"spark\.apache\.org|hadoop\.apache\.org|duckdb\.org|"
        r"arxiv\.org|aclanthology\.org|doi\.org|scala-lang\.org|"
        r"scalatest\.org|en\.wikipedia\.org|localhost|"
        # RFC 2606 reserved names: example.com/org/net and the bare
        # `.example` TLD (test fixtures mint hosts like site.example);
        # anchored at host end so e.g. example-internal.corp.net is
        # still flagged
        r"(?:[\w.-]*\.)?example(?:\.(?:com|org|net))?(?![\w.-])))[\w.-]+"),
    # package/artifact coordinates that aren't public
    "internal-pkg2": re.compile(
        r"\"(?:com|net|io)\.(?!fasterxml)[\w.]+\"\s*%{1,2}\s*\""),
    # cloud bucket URIs
    "internal-bucket": re.compile(r"(?:s3a?|gs|abfss?)://[\w.-]+"),
    # slack links / channel refs
    "slack-link": re.compile(r"slack\.com|#[a-z0-9-]*claude[a-z0-9-]*",
                             re.I),
    # credential-shaped strings
    "api-key": re.compile(
        r"AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|AIza[0-9A-Za-z_-]{35}"),
    # env vars beyond the documented SPARK_GRAFT_* / standard set
    "axon-env": re.compile(
        r"sys\.env\(\"(?!SPARK_GRAFT_|SPARK_|JAVA_|PATH|HOME|USER|TMP)"
        r"([A-Z0-9_]+)\"\)"),
}


def scan(root: str):
    hits = {c: [] for c in CATEGORIES}
    digest = hashlib.sha256()
    n_files = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if d not in SKIP_DIRS)
        for fn in sorted(filenames):
            if os.path.splitext(fn)[1] not in SCAN_EXT or fn in SKIP_FILES:
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root)
            try:
                data = open(path, "rb").read()
            except OSError:
                continue
            digest.update(rel.encode())
            digest.update(data)
            n_files += 1
            text = data.decode("utf-8", "replace")
            for cat, rx in CATEGORIES.items():
                for m in rx.finditer(text):
                    line = text.count("\n", 0, m.start()) + 1
                    hits[cat].append(f"{rel}:{line}:{m.group(0)[:80]}")
    return hits, digest.hexdigest(), n_files


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    root = sys.argv[2] if len(sys.argv) > 2 else "."
    hits, sha, n_files = scan(root)
    out = {
        "round": rnd,
        "run_ts_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "input_sha256": sha,
        "n_files_scanned": n_files,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    text = json.dumps(out, indent=2)
    with open(os.path.join(root, "LEAKCHECK.json"), "w") as f:
        f.write(text)
    print(text)
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
