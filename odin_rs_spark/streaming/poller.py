"""REST → bronze polling bridge (SURVEY §2.1 S9; parity target: the
reference's live connector polling "records since last id",
odin_sentinel/src/lib.rs:1139-1209 and live_connector.rs).

Spark's structured-streaming sources are pull-based file/queue listings,
so a push/poll HTTP feed enters the engine through a tiny driver-side
loop that writes each poll's new records as ONE atomically-renamed
micro-batch file in a bronze directory; `file_stream` (the checkpointed
incremental listing source) picks each file up exactly once. This is
the same importer seam the replay source uses (streaming/sources.py),
which is why every downstream pipeline — parse → classify → keyed state
→ snapshot/delta sink — is identical for live, replay, and backfill
runs.

At scale the poller is a single tiny process (one per feed) and the
bronze dir is object storage with source/date/hour partitioning; the
100 TB path is unaffected because all heavy lifting happens in the
streaming query, not the poller.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class RestPoller:
    """Polls `fetch_since(last_id) -> list[dict]` and lands new records
    in `bronze_dir` as JSON-lines micro-batch files.

    - **records-since-id protocol**: `last_id` is the max `id_field`
      seen so far; the fetcher returns only newer records (the
      reference's `?since=<id>` query). Records at-or-below `last_id`
      are dropped defensively, so an over-returning server still yields
      exactly-once bronze rows.
    - **atomic file commit**: each batch is written to a dot-prefixed
      temp name and `os.rename`d into place — the file-stream source
      never lists a half-written file.
    - **checkpointed cursor**: `state_path` persists `last_id` across
      poller restarts (the poller's own tiny checkpoint, separate from
      the streaming query's).
    - **crash-consistent restart**: the batch file's name embeds the
      batch's max id, and restart recovery takes the cursor as the max
      over the persisted state AND the ids embedded in already-landed
      files. A crash between the rename and the state write therefore
      can't re-land the same records: bronze rows are exactly-once
      across restarts as long as ids are monotonic under their natural
      ordering (ints numerically; strings lexicographically — the same
      assumption the records-since-id protocol itself makes) AND the
      feed keeps one id representation. If a feed switches id type
      mid-stream (int→str or back), cross-type records are deliberately
      treated as new (`_newer_than`), so that transition opens a bounded
      at-least-once window; downstream `dropDuplicates` on the record id
      restores exactly-once in the silver layer.
    """

    def __init__(
        self,
        fetch_since,
        bronze_dir: str,
        id_field: str = "id",
        state_path: str | None = None,
    ) -> None:
        self.fetch_since = fetch_since
        self.bronze_dir = bronze_dir
        self.id_field = id_field
        self.state_path = state_path or os.path.join(bronze_dir, "_poller_state.json")
        os.makedirs(bronze_dir, exist_ok=True)
        self.last_id = self._load_state()

    def _load_state(self):
        """Recover the cursor as max(persisted state, ids embedded in
        landed batch filenames): a crash between the batch rename and the
        state write leaves the file as the only record of its id range,
        and this scan is what makes that window duplicate-free."""
        cand = []
        state_type = None  # set ONLY when the state file actually parses
        try:
            with open(self.state_path) as f:
                v = json.load(f)["last_id"]
            if v is not None:
                cand.append(v)
                state_type = type(v)
        except (OSError, ValueError, KeyError):
            pass
        try:
            for name in os.listdir(self.bronze_dir):
                v = self._id_from_name(name)
                if v is not None:
                    cand.append(v)
        except OSError:
            pass
        if not cand:
            return None
        # a feed that switches id representation (or a legacy state file)
        # can mix candidate types — plain max() would TypeError in the
        # constructor. Group by EXACT type and recover within the largest
        # group (ties → the persisted state value's type, then int); the
        # over-returning-poll dedup (`_newer_than` keeps cross-type
        # records) absorbs the one-time at-least-once window a
        # conservative cursor implies.
        by_type: dict[type, list] = {}
        for v in cand:
            by_type.setdefault(type(v), []).append(v)
        if len(by_type) == 1:
            return max(cand)
        # prefer the parsed state file's type when one exists; when the
        # state file is missing/corrupt every candidate is
        # filename-derived and no type gets that preference
        pick = max(
            by_type.values(),
            key=lambda g: (len(g), type(g[0]) is state_type, type(g[0]) is int),
        )
        return max(pick)

    @staticmethod
    def _newer_than(rid, last) -> bool:
        """True when `rid` is past the cursor. A cross-type comparison
        (feed switched id representation mid-stream) cannot be ordered —
        treat the record as NEW (at-least-once, the safe direction) rather
        than raising on every poll."""
        try:
            return rid > last
        except TypeError:
            return True

    def _save_state(self) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_id": self.last_id}, f)
        os.replace(tmp, self.state_path)

    @staticmethod
    def _name_for_id(max_id) -> str:
        # hex-encode so any id value is filename-safe; tag int vs str so
        # recovery compares with the id's own ordering
        tag = "i" if isinstance(max_id, int) and not isinstance(max_id, bool) else "s"
        enc = str(max_id).encode("utf-8").hex()
        return f"batch_{tag}{enc}_{uuid.uuid4().hex}.json"

    @staticmethod
    def _id_from_name(name: str):
        if not (name.startswith("batch_") and name.endswith(".json")):
            return None
        parts = name.split("_")
        if len(parts) != 3 or len(parts[1]) < 2:
            return None
        tag, enc = parts[1][0], parts[1][1:]
        try:
            s = bytes.fromhex(enc).decode("utf-8")
        except ValueError:
            return None
        if tag == "i":
            try:
                return int(s)
            except ValueError:
                return None
        return s

    def poll_once(self) -> int:
        """One fetch → at most one bronze file. Returns records landed."""
        records = self.fetch_since(self.last_id) or []
        if self.last_id is not None:
            records = [
                r for r in records if self._newer_than(r[self.id_field], self.last_id)
            ]
        if not records:
            return 0
        ids = [r[self.id_field] for r in records]
        try:
            max_id = max(ids)
        except TypeError:
            # mixed-type batch (feed switching representation): advance
            # the cursor within the newest representation's type group
            by_type: dict[type, list] = {}
            for v in ids:
                by_type.setdefault(type(v), []).append(v)
            max_id = max(max(by_type.values(), key=len))
        name = self._name_for_id(max_id)
        tmp = os.path.join(self.bronze_dir, "." + name)
        with open(tmp, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, os.path.join(self.bronze_dir, name))
        # state write happens AFTER the rename: if we crash in between,
        # _load_state recovers the cursor from the filename instead of
        # re-fetching and re-landing the same range
        self.last_id = max_id
        self._save_state()
        return len(records)

    def run(self, n_polls: int, interval_sec: float = 1.0) -> int:
        """Bounded polling loop (tests/cron runs); a live deployment
        loops forever with backoff on fetch errors (T8)."""
        total = 0
        for i in range(n_polls):
            total += self.poll_once()
            if i + 1 < n_polls:
                time.sleep(interval_sec)
        return total


def http_json_fetcher(url_template: str, timeout_sec: float = 10.0):
    """fetch_since callable issuing `GET url_template.format(since=...)`
    and expecting a JSON array — the production seam for RestPoller
    (stdlib urllib; no extra deps). Network errors return [] so the
    poll loop degrades to retry-next-interval (T8 backoff semantics)."""
    import urllib.request

    def fetch(last_id):
        url = url_template.format(since=last_id if last_id is not None else 0)
        try:
            with urllib.request.urlopen(url, timeout=timeout_sec) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except Exception:
            return []

    return fetch
