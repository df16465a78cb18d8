#!/usr/bin/env python3
"""Deterministic generator for the ~100x raw-export fixtures
(src/main/resources/ingest/large/). Committed outputs give i4/i5 a
non-trivial ingest bench row; regenerate with: python3 tools/gen_large_export.py

Shapes mirror the small fixtures' edge cases at scale: ISO-Z and
epoch-string timestamps, duplicated conversation entries, null message
text, role-less ChatGPT roots, branching trees, empty parts, null/missing
model_slug.
"""
import json
import random
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/main/resources/ingest/large"
rng = random.Random(20260813)

WORDS = ("analysis spark engine conversation message export pipeline token "
         "window shuffle partition schema column driver executor stream "
         "batch query plan join filter aggregate parquet fixture oracle").split()


def sentence(n):
    return " ".join(rng.choice(WORDS) for _ in range(n)).capitalize() + "."


def text_block():
    s = " ".join(sentence(rng.randint(5, 12)) for _ in range(rng.randint(1, 4)))
    if rng.random() < 0.08:
        s += "\n```python\nprint('hello')\n```\n" + sentence(6)
    return s


def iso(epoch):
    import datetime
    return datetime.datetime.fromtimestamp(epoch, datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")


def gen_claude():
    convs = []
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    for i in range(300):
        t0 = base + i * 3600
        use_iso = i % 2 == 0
        ts = (lambda e: iso(e)) if use_iso else (lambda e: str(e))
        msgs = []
        for j in range(rng.randint(6, 14)):
            msgs.append({
                "uuid": f"lm-{i}-{j}",
                "sender": "human" if j % 2 == 0 else "assistant",
                "text": None if (i % 7 == 0 and j == 1) else text_block(),
                "created_at": ts(t0 + j * 30),
            })
        convs.append({
            "uuid": f"lc-{i}",
            "name": f"Large conversation {i}: {sentence(3)[:-1]}",
            "created_at": ts(t0),
            "updated_at": ts(t0 + 1800),
            "account": {"uuid": f"acct-{i % 9}"},
            "chat_messages": msgs,
        })
    # duplicated entries: the idempotent-load path must dedup them
    for i in range(0, 300, 60):
        convs.append(convs[i])
    return convs


def gen_chatgpt():
    convs = []
    base = 1706745600.0  # 2024-02-01 00:00:00 UTC
    for i in range(200):
        t0 = base + i * 7200
        mapping = {}
        mapping["root"] = {"parent": None, "children": ["n0"], "message": None}
        n_nodes = rng.randint(8, 16)
        prev = "root"
        order = 0
        for j in range(n_nodes):
            nid = f"n{j}"
            children = []
            if j + 1 < n_nodes:
                children.append(f"n{j+1}")
            if j % 5 == 4:  # dead side-branch: BFS must still order by level
                bid = f"b{j}"
                children.append(bid)
                mapping[bid] = {
                    "parent": nid, "children": [],
                    "message": {
                        "author": {"role": "assistant"},
                        "content": {"parts": [f"branch take {j}: " + sentence(8)]},
                        "create_time": t0 + j * 60 + 30.5,
                        "metadata": {"model_slug": "gpt-4o"},
                    },
                }
            role = "user" if order % 2 == 0 else "assistant"
            parts = [] if (i % 11 == 0 and j == 2) else [text_block()]
            slug = None if j % 3 == 0 else ("gpt-4" if j % 3 == 1 else "gpt-4o")
            mapping[nid] = {
                "parent": prev, "children": children,
                "message": {
                    "author": {"role": role},
                    "content": {"parts": parts},
                    "create_time": t0 + j * 60.0,
                    "metadata": {"model_slug": slug},
                },
            }
            prev = nid
            order += 1
        convs.append({
            "id": f"lg-{i}",
            "title": f"Large chatgpt {i}: {sentence(3)[:-1]}",
            "create_time": t0,
            "update_time": t0 + n_nodes * 60.0,
            "mapping": mapping,
        })
    return convs


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    c = gen_claude()
    g = gen_chatgpt()
    (OUT / "claude_export.json").write_text(json.dumps(c, indent=None))
    (OUT / "chatgpt_export.json").write_text(json.dumps(g, indent=None))
    print(f"claude: {len(c)} entries, {(OUT / 'claude_export.json').stat().st_size} bytes")
    print(f"chatgpt: {len(g)} entries, {(OUT / 'chatgpt_export.json').stat().st_size} bytes")


if __name__ == "__main__":
    main()
