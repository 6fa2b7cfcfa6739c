"""S1 source fetch — driver-side interface stub (SURVEY §2.1 S1, §7
"What NOT to build").

The reference pulls raw dumps (``.tsv.gz``, ``.xml.zip``, GAF, ttl) over
HTTP/FTP with retries and byte accounting before any parsing starts
`[R: Common/utils.py (GetData) — unverified]`. Fetching is *orchestration*,
not a query operator: it runs once on the driver (or an external workflow
engine) and lands files where ``spark.read`` can see them. The engine
therefore ships only the interface + a local-filesystem implementation used
by tests; a production deployment plugs in its own transport behind the
same contract.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass


@dataclass
class FetchResult:
    """Mirror of the reference's byte-count / success bookkeeping."""

    url: str
    dest: str
    bytes_fetched: int
    success: bool


class SourceFetcher:
    """Transport interface. ``fetch`` must be idempotent (re-fetch of the
    same (url, dest) overwrites) so a failed pipeline stage can re-run."""

    def fetch(self, url: str, dest: str) -> FetchResult:
        raise NotImplementedError(
            "network transport is out of engine scope; deploy-side code "
            "implements SourceFetcher (HTTP/FTP with retries) and lands "
            "files on storage Spark can read")


class LocalFileFetcher(SourceFetcher):
    """Deterministic stand-in: 'fetches' from the local filesystem.

    Lets pipeline plans (plans/graph_build.py) exercise the
    fetch -> parse -> normalize -> merge sequence hermetically.
    """

    def fetch(self, url: str, dest: str) -> FetchResult:
        src = url.removeprefix("file://")
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        shutil.copyfile(src, dest)
        return FetchResult(url=url, dest=dest,
                           bytes_fetched=os.path.getsize(dest), success=True)
