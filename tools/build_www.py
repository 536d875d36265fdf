#!/usr/bin/env python
"""Build the demo-gallery site (reference: tools/build_www.sh + www/ —
wasm demo gallery on GitHub Pages).

The TPU framework's deploy story is server-side rendering (viewer/serve.py),
so the www build produces: per-example thumbnails rendered through the real
headless pipeline, and a static ``www/index.html`` gallery whose cards link to
the interactive viewer's ``/example/<id>`` route (live scene switching) and
show the exact CLI to reproduce each config — the role examples.json plays
for the reference's gallery (www/examples/examples.json).

    python tools/build_www.py             # thumbnails + www/index.html
    python tools/build_www.py --no-render # regenerate the page only
"""

from __future__ import annotations

import html
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PAGE_HEAD = """<!DOCTYPE html>
<html><head><meta charset="utf-8">
<title>bevy_gaussian_splatting_tpu — example gallery</title><style>
 body { margin:0; background:#111; color:#ddd;
        font:14px/1.45 system-ui, monospace; }
 header { padding:18px 24px; border-bottom:1px solid #333; }
 h1 { margin:0; font-size:18px; }
 .sub { opacity:.6; font-size:12px; margin-top:4px; }
 .grid { display:grid; gap:16px; padding:24px;
         grid-template-columns:repeat(auto-fill, minmax(240px, 1fr)); }
 .card { background:#1a1a1a; border:1px solid #2c2c2c; border-radius:8px;
         overflow:hidden; }
 .card img { display:block; width:100%; image-rendering:pixelated;
             aspect-ratio:1; background:#000; }
 .card .body { padding:10px 12px; }
 .card h2 { margin:0 0 4px; font-size:14px; }
 .card p { margin:0 0 8px; font-size:12px; opacity:.75; }
 .tags span { display:inline-block; background:#26324a; color:#9cf;
              border-radius:3px; padding:1px 6px; margin-right:4px;
              font-size:11px; }
 code { display:block; background:#0d0d0d; border-radius:4px; padding:6px 8px;
        margin-top:8px; font-size:11px; white-space:pre-wrap;
        word-break:break-all; color:#8c8; }
 a.view { display:inline-block; margin-top:8px; color:#6cf;
          text-decoration:none; font-size:12px; }
</style></head><body>
<header><h1>bevy_gaussian_splatting_tpu — example gallery</h1>
<div class="sub">server-rendered on TPU · serve live with
<b>python -m bevy_gaussian_splatting_tpu.viewer.serve --gallery www</b></div>
</header>
<div class="grid">
"""


def build_page(manifest: dict, thumb_prefix: str = "") -> str:
    cards = []
    for ex in manifest["examples"]:
        tags = "".join(f"<span>{html.escape(t)}</span>" for t in ex.get("tags", []))
        cmd = "python -m bevy_gaussian_splatting_tpu.viewer.serve " + " ".join(
            ex["args"]
        )
        cards.append(
            f'<div class="card" id="{html.escape(ex["id"])}">'
            f'<a href="/example/{html.escape(ex["id"])}">'
            f'<img src="{thumb_prefix}{html.escape(ex["thumbnail"])}" '
            f'alt="{html.escape(ex["title"])}" loading="lazy"></a>'
            f'<div class="body"><h2>{html.escape(ex["title"])}</h2>'
            f'<p>{html.escape(ex["description"])}</p>'
            f'<div class="tags">{tags}</div>'
            f'<a class="view" href="/example/{html.escape(ex["id"])}">open in '
            f"viewer →</a>"
            f"<code>{html.escape(cmd)}</code>"
            f"</div></div>"
        )
    return _PAGE_HEAD + "\n".join(cards) + "\n</div></body></html>\n"


def main(argv=None) -> int:
    import argparse
    import shutil

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", default=os.path.join(ROOT, "examples/examples.json"))
    p.add_argument("--out", default=os.path.join(ROOT, "www"))
    p.add_argument("--size", type=int, default=192)
    p.add_argument("--no-render", action="store_true",
                   help="regenerate index.html without re-rendering thumbnails")
    p.add_argument("--only", default=None)
    args = p.parse_args(argv)

    with open(args.manifest) as f:
        manifest = json.load(f)

    os.makedirs(args.out, exist_ok=True)
    thumb_dir = os.path.join(args.out, "thumbnails")
    os.makedirs(thumb_dir, exist_ok=True)

    if not args.no_render:
        from render_thumbnails import main as render_main  # sibling tool

        rc = render_main(
            ["--manifest", args.manifest, "--out-dir", thumb_dir,
             "--size", str(args.size)]
            + (["--only", args.only] if args.only else [])
        )
        if rc != 0:
            return rc

    # ship the manifest next to the page (the reference serves
    # www/examples/examples.json for its viewer links)
    os.makedirs(os.path.join(args.out, "examples"), exist_ok=True)
    shutil.copyfile(
        args.manifest, os.path.join(args.out, "examples", "examples.json")
    )
    page = build_page(manifest)
    index = os.path.join(args.out, "index.html")
    with open(index, "w") as f:
        f.write(page)
    print(f"gallery: {index} ({len(manifest['examples'])} examples)")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.exit(main())
