#!/usr/bin/env python3
"""Self-runnable leak check over every git-tracked text file.

The per-round LEAKCHECK.json artifact records only a round number and
hit lists, so a clean re-run is indistinguishable from a hand-edited
round bump (ADVICE r8 #2). This scanner emits a verifiable artifact:
UTC timestamp, the git HEAD it scanned, the number of files and bytes
scanned, and per-category hits with file:line locations — so "the scan
ran, on this tree, over this many files" is checkable after the fact.

Categories (public-hygiene checks for an open Spark library):
  url            http(s) URLs outside the public allowlist (review list,
                 not an auto-fail: new legitimate citations land here
                 until allowlisted)
  bucket         cloud/storage URIs (s3/gs/abfss/wasbs/hdfs host paths)
  api-key        credential shapes (AWS key ids, bearer-style sk- keys,
                 Slack/GitHub tokens, PEM private-key headers)
  slack-link     slack.com archive/share links
  import         Scala import roots outside the declared dependency set
  env-var        environment variables read outside the documented
                 SPARK_GRAFT_*/standard set

Exit code: 0 when every auto-fail category (bucket, api-key, slack-link,
import, env-var) is empty; 2 otherwise. `url` hits are informational.

Usage: python3 tools/leakcheck.py [-o LEAKCHECK_SELF.json]
"""
import argparse
import datetime
import json
import re
import subprocess
import sys

URL_ALLOW = re.compile(
    r"https?://("
    r"github\.com|raw\.githubusercontent\.com|"
    r"([a-z0-9-]+\.)*apache\.org|"
    r"arxiv\.org|aclanthology\.org|dl\.acm\.org|doi\.org|"
    r"([a-z0-9-]+\.)*wikipedia\.org|"
    r"duckdb\.org|scala-lang\.org|scala-sbt\.org|openjdk\.org|"
    r"docs\.oracle\.com|maven\.apache\.org|repo1\.maven\.org|"
    r"commoncrawl\.org|huggingface\.co|"
    r"www\.w3\.org|json\.org|parquet\.apache\.org|"
    r"localhost(:\d+)?|127\.0\.0\.1(:\d+)?|example\.(com|org)"
    # terminator: the allowlisted domain must be the WHOLE host — a '.'
    # counts only as a sentence-final dot (followed by whitespace/end),
    # never as another hostname label (github.com.evil.example must not
    # pass) (ADVICE r9)
    r")([/:\s\"')\]>,]|\.(?=\s|$)|$)")

# Only package-rooted imports are candidates (value imports like
# `spark.implicits._` start at a local identifier, not a root package).
IMPORT_ROOT = re.compile(r"^(com|org|net|io|dev|ai|edu|gov)\.")
# import roots available on the build classpath (build.sbt + /opt/spark/jars)
IMPORT_ALLOW = re.compile(
    r"^(org\.apache\.(spark|hadoop|parquet|log4j|logging)|"
    r"org\.scalatest|org\.scalacheck|org\.slf4j|com\.sun|"
    r"com\.fasterxml\.jackson|io\.netty|org\.json4s|org\.codehaus|com\.google)")

# documented engine env vars + standard process env
ENV_ALLOW = re.compile(
    r"^(SPARK_GRAFT_[A-Z_]+|SPARK_[A-Z_]+|JAVA_[A-Z_]+|PATH|HOME|USER|TMPDIR|"
    r"TZ|LANG|LC_[A-Z]+|COURSIER_[A-Z_]+|SBT_[A-Z_]+)$")

PATTERNS = {
    # non-capturing scheme group: findall must return the WHOLE URI so the
    # artifact's hit fragments carry the actual path, not just "s3" (and
    # not "" for hdfs matches) (ADVICE r9)
    "bucket": re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[^\s\"']+"
                         r"|\bhdfs://[a-z0-9][^\s\"']*"),
    "api-key": re.compile(r"\bAKIA[0-9A-Z]{16}\b|\bsk-[A-Za-z0-9]{20,}\b"
                          r"|\bxox[baprs]-[A-Za-z0-9-]{10,}"
                          r"|\bghp_[A-Za-z0-9]{36}\b"
                          r"|-----BEGIN [A-Z ]*PRIVATE KEY-----"),
    "slack-link": re.compile(r"[a-z0-9-]+\.slack\.com|slack\.com/archives"),
}
URL = re.compile(r"https?://[^\s\"'<>)\]]+")
SCALA_IMPORT = re.compile(r"^\s*import\s+([A-Za-z0-9_.]+)")
ENV_READ = re.compile(r"sys\.env(?:\.get(?:OrElse)?)?\(\s*\"([A-Z0-9_]+)\"")

AUTO_FAIL = ("bucket", "api-key", "slack-link", "import", "env-var")


def tracked_files():
    out = subprocess.check_output(["git", "ls-files", "-z"], text=True)
    return [f for f in out.split("\0") if f]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", default="LEAKCHECK_SELF.json")
    args = ap.parse_args()

    head = subprocess.check_output(
        ["git", "rev-parse", "HEAD"], text=True).strip()
    dirty = bool(subprocess.run(
        ["git", "diff", "--quiet", "HEAD"]).returncode)

    hits = {k: [] for k in
            ("url", "bucket", "api-key", "slack-link", "import", "env-var")}
    files = tracked_files()
    n_bytes = 0
    n_scanned = 0
    for path in files:
        # the scanner's own artifacts quote prior hits — scanning them
        # would echo every URL forever
        if path.split("/")[-1].startswith("LEAKCHECK"):
            continue
        try:
            with open(path, "rb") as fh:
                raw = fh.read()
        except OSError:
            continue
        if b"\0" in raw[:4096]:  # binary
            continue
        n_scanned += 1
        n_bytes += len(raw)
        text = raw.decode("utf-8", errors="replace")
        for ln, line in enumerate(text.splitlines(), 1):
            loc = f"{path}:{ln}"
            for url in URL.findall(line):
                if not URL_ALLOW.match(url + " "):
                    hits["url"].append(f"{loc} {url}")
            for cat, pat in PATTERNS.items():
                for m in pat.findall(line):
                    frag = m if isinstance(m, str) else ":".join(
                        x for x in m if x)
                    hits[cat].append(f"{loc} {frag}")
            if path.endswith(".scala"):
                im = SCALA_IMPORT.match(line)
                if im and IMPORT_ROOT.match(im.group(1)) \
                        and not IMPORT_ALLOW.match(im.group(1)):
                    hits["import"].append(f"{loc} {im.group(1)}")
                for var in ENV_READ.findall(line):
                    if not ENV_ALLOW.match(var):
                        hits["env-var"].append(f"{loc} {var}")

    n_fail = sum(len(hits[c]) for c in AUTO_FAIL)
    artifact = {
        "generated_at": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "git_head": head,
        "worktree_dirty": dirty,
        "files_tracked": len(files),
        "files_scanned": n_scanned,
        "bytes_scanned": n_bytes,
        "n_fail_hits": n_fail,
        "n_url_review": len(hits["url"]),
        "hits": hits,
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=2)
        fh.write("\n")
    print(f"[leakcheck] {n_scanned} files / {n_bytes} bytes scanned at "
          f"{head[:12]}{'+dirty' if dirty else ''}: "
          f"{n_fail} fail-category hits, "
          f"{len(hits['url'])} URLs for review -> {args.out}")
    sys.exit(2 if n_fail else 0)


if __name__ == "__main__":
    main()
