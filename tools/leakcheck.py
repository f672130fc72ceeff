#!/usr/bin/env python3
"""Leak scanner: greps the repo's shipped sources for proprietary/internal
references that must never appear in a public, from-public-knowledge build —
internal package imports, non-public URLs/hostnames, cloud bucket paths,
Slack links, credential-shaped strings, and internal env vars.

Regenerates LEAKCHECK.json (ADVICE r8: the round field was hand-bumped
without re-running a scanner, because no scanner lived in the repo — now
one does).

Usage: python3 tools/leakcheck.py [round_number]
"""
import json, re, subprocess, sys, os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Shipped surface: everything tracked except retrieved-content docs that
# legitimately QUOTE public snippets and the generated artifacts.
EXCLUDE = {"PAPERS.md", "SNIPPETS.md", "LEAKCHECK.json"}

PATTERNS = {
    # imports/packages outside the public Spark/Scala/Java surface that
    # smell corporate-internal (nothing in this repo may import beyond
    # org.apache.*, java.*, javax.*, scala.*, graft.*, org.scalatest.*,
    # org.slf4j.*, com.google.common.* [spark-shaded guava], org.xerial.*)
    # (com.fasterxml = Jackson and org.json4s = json4s, both shipped in
    # /opt/spark/jars as Spark dependencies; com.sun.net = JDK built-in
    # httpserver; lowercase one-letter/`spark` prefixes are local-value
    # implicits imports, not packages)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.|java\.|javax\.|scala\.|graft\.|"
        r"org\.scalatest\.|org\.scalacheck\.|org\.slf4j\.|org\.junit\.|"
        r"com\.google\.common\.|org\.xerial\.|com\.fasterxml\.|"
        r"org\.json4s\.|com\.sun\.net\.|spark\.implicits|[a-z]\.implicits)"
        r"[a-z]+\.[a-z0-9_]+\.",
        re.M),
    # non-public URLs: anything that is not an apache/github/arxiv/ietf/
    # wikipedia/spark-docs style public host
    "internal-url": re.compile(
        r"https?://(?!(?:www\.)?(?:apache\.org|spark\.apache\.org|"
        r"parquet\.apache\.org|github\.com|raw\.githubusercontent\.com|"
        r"arxiv\.org|doi\.org|ietf\.org|datatracker\.ietf\.org|"
        r"en\.wikipedia\.org|duckdb\.org|scala-lang\.org|"
        r"docs\.oracle\.com|openjdk\.org|localhost|127\.0\.0\.1|"
        r"example\.com))[A-Za-z0-9.-]+"),
    # corp-internal hostname shapes
    "internal-pkg2": re.compile(
        r"\b[a-z0-9-]+\.(?:corp|internal|intranet)\.[a-z0-9.-]+\b"),
    # cloud bucket/object-store paths (none may be referenced at all)
    "internal-bucket": re.compile(r"\b(?:s3|s3a|gs|abfss?|wasbs?)://[^\s\"']+"),
    # slack links / channel archives
    "slack-link": re.compile(r"slack\.com/|\bslack://"),
    # credential-shaped strings (AWS keys, GitHub/OpenAI/Anthropic-style
    # tokens, PEM blocks)
    "api-key": re.compile(
        r"\b(?:AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{36}|sk-[A-Za-z0-9-]{20,}|"
        r"xox[baprs]-[A-Za-z0-9-]{10,})\b|-----BEGIN (?:RSA |EC )?PRIVATE KEY-----"),
    # env vars outside the repo's own SPARK_GRAFT_*/GRAFT_* namespace and
    # the public Spark/Java ones (an internal deploy env var would leak here)
    "axon-env": re.compile(
        r"sys\.env(?:\.get(?:OrElse)?)?\(\s*\"(?!SPARK_GRAFT_|GRAFT_|PROBE_|"
        r"SPARK_DRIVER_MEM|JAVA_HOME|PATH|HOME|TZ)[A-Z][A-Z0-9_]*\""),
}


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=ROOT, capture_output=True,
                         text=True, check=True).stdout.split()
    keep = []
    for f in out:
        base = os.path.basename(f)
        if base in EXCLUDE:
            continue
        if f.startswith((".claude/", "project/")):
            continue
        if base.endswith((".scala", ".sbt", ".py", ".md", ".json", ".sh")):
            keep.append(f)
    return keep


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = {k: [] for k in PATTERNS}
    for f in tracked_files():
        try:
            text = open(os.path.join(ROOT, f), encoding="utf-8").read()
        except (UnicodeDecodeError, FileNotFoundError):
            continue
        for cat, rx in PATTERNS.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{f}:{line}: {m.group(0)[:80]}")
    n = sum(len(v) for v in hits.values())
    report = {"round": rnd, "n_hits": n, "hits": hits,
              "generator": "tools/leakcheck.py",
              "files_scanned": len(tracked_files())}
    with open(os.path.join(ROOT, "LEAKCHECK.json"), "w") as fh:
        json.dump(report, fh, indent=2)
        fh.write("\n")
    print(f"scanned {report['files_scanned']} files, {n} hits")
    for cat, v in hits.items():
        for h in v:
            print(f"  [{cat}] {h}")
    sys.exit(1 if n else 0)


if __name__ == "__main__":
    main()
