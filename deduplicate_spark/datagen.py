"""Deterministic synthetic transcripts with planted duplicates.

Transcript translation of the reference's two fixture DSLs
(/root/reference/test_deduplicate.py:59-88 — "content = basename prefix" so
`file1_a`/`file1_b` are duplicates; /root/reference/test_dupe_analysis.py:127-171 —
`b==a` exact copies, `b==a:1KB+pad` prefix-concat, sized random content).
Unlike the reference's unseeded ``random.randint`` generator
(test_dupe_analysis.py:86-124) everything here is seeded and reproducible.

Emits a planted-duplicate manifest `(conv_a, conv_b, kind, expected_level)` —
the ground truth for the dup-pair recall >= 0.99 gate (BASELINE.md).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta

import pandas as pd

VOCAB = [
    # fixed 160-word vocabulary; word salad keyed by (seed, conv_id, turn_idx)
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "query", "table", "join", "merge", "sort",
    "filter", "window", "batch", "stream", "spark", "shuffle", "partition",
    "broadcast", "hash", "scan", "vector", "column", "row", "group", "agg",
    "key", "value", "data", "line", "order", "part", "customer", "supplier",
    "nation", "region", "fast", "slow", "big", "small", "the", "a", "dup",
    "run", "walk", "jump", "read", "write", "open", "close", "start", "stop",
    "begin", "end", "first", "last", "next", "prev", "up", "down", "left",
    "right", "north", "south", "east", "west", "red", "green", "blue",
    "yellow", "black", "white", "gray", "pink", "gold", "silver", "iron",
    "stone", "wood", "fire", "water", "earth", "wind", "cloud", "rain",
    "snow", "storm", "sun", "moon", "star", "sky", "sea", "lake", "river",
    "hill", "tree", "leaf", "root", "branch", "seed", "fruit", "grain",
    "bread", "milk", "salt", "sugar", "tea", "coffee", "cup", "plate",
    "fork", "knife", "spoon", "bowl", "door", "wall", "roof", "floor",
    "house", "road", "bridge", "tower", "gate", "field", "farm", "city",
    "town", "village", "map", "path", "trail", "track", "code", "test",
    "build", "deploy", "log", "trace", "debug", "error", "warn", "info",
]

ROLES = ["user", "assistant", "user", "assistant", "tool", "system"]
TOOLS = ["search", "calc", "browser", "editor", ""]
_T0 = datetime(2024, 1, 1)


def _turn_text(seed: int, conv_key: str, turn_idx: int, n_words: int) -> str:
    rng = random.Random(f"{seed}:{conv_key}:{turn_idx}")
    return " ".join(rng.choice(VOCAB) for _ in range(n_words))


@dataclass
class PlantedPair:
    conv_a: str
    conv_b: str
    kind: str            # exact | near | prefix | substring | excluded | empty
    expected_level: str  # exact | near | substring | none


def _conv_rows(conv_id: str, texts: list[str], seed: int) -> list[dict]:
    rng = random.Random(f"{seed}:meta:{conv_id}")
    rows = []
    ts = _T0 + timedelta(seconds=rng.randint(0, 10_000_000))
    for i, text in enumerate(texts):
        role = ROLES[i % len(ROLES)]
        tool = rng.choice(TOOLS) if role == "tool" else ""
        ts = ts + timedelta(seconds=rng.randint(1, 120))
        rows.append(
            {"conv_id": conv_id, "turn_idx": i, "role": role, "text": text,
             "tool": tool, "ts": ts}
        )
    return rows


def generate_transcripts(
    n_base: int = 100,
    seed: int = 42,
    dup_fraction: float = 0.3,
    source_prefixes: tuple[str, ...] = ("src0", "src1", "src2"),
) -> tuple[pd.DataFrame, list[PlantedPair]]:
    """Generate a transcript corpus with planted duplicate structure.

    ~n_base unique base conversations; a ``dup_fraction`` of them get planted
    duplicates of mixed kinds. Returns (turns_df, manifest).
    """
    master = random.Random(seed)
    rows: list[dict] = []
    manifest: list[PlantedPair] = []

    base_ids = []
    for i in range(n_base):
        src = source_prefixes[i % len(source_prefixes)]
        conv_id = f"{src}/conv{i:06d}"
        rng = random.Random(f"{seed}:shape:{conv_id}")
        n_turns = rng.randint(2, 16)
        texts = [
            _turn_text(seed, conv_id, t, rng.randint(8, 60)) for t in range(n_turns)
        ]
        rows.extend(_conv_rows(conv_id, texts, seed))
        base_ids.append((conv_id, texts))

    n_dup = int(n_base * dup_fraction)
    dup_targets = master.sample(base_ids, min(n_dup, len(base_ids)))

    for j, (src_id, texts) in enumerate(dup_targets):
        kind = ("exact", "exact3", "near", "prefix", "substring")[j % 5]
        if kind == "exact":
            # b==a — test_dupe_analysis.py:246-265 analog
            dup_id = f"dupx/{src_id.split('/')[-1]}_copy"
            rows.extend(_conv_rows(dup_id, list(texts), seed))
            manifest.append(PlantedPair(src_id, dup_id, "exact", "exact"))
        elif kind == "exact3":
            # same conversation across 3 source prefixes —
            # nested/separate-dirs analog (test_dupe_analysis.py:296-375)
            prev = src_id
            for p in ("mirror1", "mirror2"):
                dup_id = f"{p}/{src_id.split('/')[-1]}"
                rows.extend(_conv_rows(dup_id, list(texts), seed))
                manifest.append(PlantedPair(src_id, dup_id, "exact", "exact"))
                manifest.append(PlantedPair(prev, dup_id, "exact", "exact")) if prev != src_id else None
                prev = dup_id
        elif kind == "near":
            # small in-place edits: high-Jaccard near duplicate
            rng = random.Random(f"{seed}:near:{src_id}")
            edited = []
            for text in texts:
                words = text.split()
                n_edit = max(1, len(words) // 25)  # ~4% token churn
                for _ in range(n_edit):
                    words[rng.randrange(len(words))] = rng.choice(VOCAB)
                edited.append(" ".join(words))
            dup_id = f"dupn/{src_id.split('/')[-1]}_near"
            rows.extend(_conv_rows(dup_id, edited, seed))
            manifest.append(PlantedPair(src_id, dup_id, "near", "near"))
        elif kind == "prefix":
            # c == a:prefix + pad — test_dupe_analysis.py:273-274 analog.
            # Keeps ~85% of A's turns then diverges -> still near by Jaccard.
            rng = random.Random(f"{seed}:prefix:{src_id}")
            keep = max(2, int(len(texts) * 0.85))
            dup_id = f"dupp/{src_id.split('/')[-1]}_prefix"
            new_texts = list(texts[:keep]) + [
                _turn_text(seed, dup_id, keep + t, rng.randint(8, 30))
                for t in range(max(1, len(texts) - keep))
            ]
            rows.extend(_conv_rows(dup_id, new_texts, seed))
            level = "near" if keep / len(new_texts) >= 0.75 else "none"
            manifest.append(PlantedPair(src_id, dup_id, "prefix", level))
        else:  # substring
            # embeds a long exact substring of A in novel surroundings —
            # the max_overlap LCS graft (deduplicate.py:242-260)
            rng = random.Random(f"{seed}:sub:{src_id}")
            dup_id = f"dups/{src_id.split('/')[-1]}_sub"
            core = "\n".join(texts)[: max(300, len("\n".join(texts)) // 2)]
            new_texts = [
                _turn_text(seed, dup_id, 0, 40),
                core,
                _turn_text(seed, dup_id, 2, 40),
            ]
            rows.extend(_conv_rows(dup_id, new_texts, seed))
            manifest.append(PlantedPair(src_id, dup_id, "substring", "substring"))

    # empty conversations: all-empty turn texts -> one shared empty cluster
    # (zero-byte files share zero_hash, test_dupe_analysis.py:551-579)
    empty_ids = [f"empty/conv{k}" for k in range(3)]
    for eid in empty_ids:
        rows.extend(_conv_rows(eid, ["", "", ""], seed))
    manifest.append(PlantedPair(empty_ids[0], empty_ids[1], "empty", "exact"))
    manifest.append(PlantedPair(empty_ids[0], empty_ids[2], "empty", "exact"))
    manifest.append(PlantedPair(empty_ids[1], empty_ids[2], "empty", "exact"))

    # excluded-role duplicate: copy exists only as system-role rows ->
    # filtered pre-cascade, must NOT be detected (test_dupe_analysis.py:528-549)
    if base_ids:
        src_id, texts = base_ids[0]
        ex_id = f"dupe_excl/{src_id.split('/')[-1]}_sys"
        ex_rows = _conv_rows(ex_id, list(texts), seed)
        for r in ex_rows:
            r["role"] = "system"
        rows.extend(ex_rows)
        manifest.append(PlantedPair(src_id, ex_id, "excluded", "none"))

    turns = pd.DataFrame(rows)
    turns["turn_idx"] = turns["turn_idx"].astype("int32")
    return turns, manifest


def manifest_df(manifest: list[PlantedPair]) -> pd.DataFrame:
    return pd.DataFrame([vars(p) for p in manifest])
