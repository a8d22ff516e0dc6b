"""Generate docs/site/: a rendered, browsable HTML documentation site.

Usage: python docs/gen_site.py   (writes docs/site/*.html)

A stdlib-only sphinx analogue (sphinx is not installable in this
environment): the site renders

- one API page per public module with *full* docstrings for every public
  class/function (methods and properties included), preserving the
  ``mici/<file>:<lines>`` reference citations used for parity review and
  cross-linking every mention of a documented ``mici_tpu`` name;
- the hand-written guides (README, DESIGN, BENCHMARKS, PARITY, ROADMAP)
  through a small markdown renderer (headers, fenced code, lists,
  tables, inline code/bold/links);
- an index page with the SURVEY layer map and a full API name index.

Reference analogue: the sphinx site under /root/reference/docs/ (built
from the same kind of docstring corpus by sphinx.ext.autodoc).
"""

from __future__ import annotations

import html
import importlib
import inspect
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gen_api_reference import MODULES  # noqa: E402  (same module list)

OUT_DIR = Path(__file__).parent / "site"

GUIDES = [
    ("README.md", "../README.md", "Overview"),
    ("DESIGN.md", "DESIGN.md", "Design notes"),
    ("BENCHMARKS.md", "BENCHMARKS.md", "Benchmarks"),
    ("PARITY.md", "PARITY.md", "Reference parity map"),
    ("ROADMAP.md", "ROADMAP.md", "Roadmap"),
]

CSS = """
:root { --fg: #1a1a1a; --dim: #666; --bg: #ffffff; --accent: #0b5394;
        --code-bg: #f5f5f4; --border: #e0e0e0; }
* { box-sizing: border-box; }
body { color: var(--fg); background: var(--bg); margin: 0;
       font: 16px/1.55 system-ui, -apple-system, "Segoe UI", sans-serif; }
.layout { display: flex; min-height: 100vh; }
nav { width: 240px; flex: none; border-right: 1px solid var(--border);
      padding: 1.2rem 1rem; font-size: 0.88rem; }
nav h2 { font-size: 0.72rem; text-transform: uppercase; color: var(--dim);
         letter-spacing: 0.07em; margin: 1.1rem 0 0.3rem; }
nav a { display: block; color: var(--accent); text-decoration: none;
        padding: 0.1rem 0; }
nav a:hover { text-decoration: underline; }
main { flex: 1; min-width: 0; max-width: 54rem; padding: 1.5rem 2.2rem 4rem; }
h1, h2, h3, h4 { line-height: 1.25; scroll-margin-top: 0.8rem; }
h1 { font-size: 1.55rem; border-bottom: 1px solid var(--border);
     padding-bottom: 0.4rem; }
h2 { font-size: 1.22rem; margin-top: 2.2rem; }
h3 { font-size: 1.02rem; margin-top: 1.8rem; }
code, pre { font: 0.86em/1.5 ui-monospace, "SF Mono", Menlo, monospace;
            background: var(--code-bg); border-radius: 4px; }
code { padding: 0.1em 0.3em; }
pre { padding: 0.7rem 0.9rem; overflow-x: auto; }
pre code { padding: 0; background: none; }
table { border-collapse: collapse; font-size: 0.9rem; margin: 0.8rem 0; }
th, td { border: 1px solid var(--border); padding: 0.3rem 0.6rem;
         text-align: left; vertical-align: top; }
th { background: var(--code-bg); }
a { color: var(--accent); }
.sig { background: var(--code-bg); padding: 0.5rem 0.8rem; border-radius: 6px;
       border-left: 3px solid var(--accent); overflow-x: auto; }
.member { margin: 0.9rem 0 0.9rem 1.2rem; padding-left: 0.9rem;
          border-left: 2px solid var(--border); }
.kind { color: var(--dim); font-size: 0.78rem; text-transform: uppercase;
        letter-spacing: 0.05em; }
.doc { margin-top: 0.35rem; white-space: pre-wrap; }
.docline { margin: 0.1rem 0; }
footer { color: var(--dim); font-size: 0.8rem; margin-top: 3rem;
         border-top: 1px solid var(--border); padding-top: 0.8rem; }
"""


def _inline_md(text, link_names):
    """Escape + render inline markdown (code, bold, links, crosslinks)."""
    out, pos = [], 0
    # split out `code` spans first so we don't format inside them
    for m in re.finditer(r"``([^`]+)``|`([^`]+)`", text):
        out.append(_inline_fmt(text[pos:m.start()], link_names))
        code = m.group(1) or m.group(2)
        out.append(f"<code>{_crosslink(html.escape(code), link_names)}</code>")
        pos = m.end()
    out.append(_inline_fmt(text[pos:], link_names))
    return "".join(out)


def _inline_fmt(text, link_names):
    text = html.escape(text)
    text = re.sub(r"\[([^\]]+)\]\(([^)\s]+)\)",
                  lambda m: f'<a href="{m.group(2)}">{m.group(1)}</a>', text)
    text = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", text)
    return _crosslink(text, link_names)


def _crosslink(escaped, link_names):
    """Link mici_tpu.<mod>[.<name>] mentions to their API anchors."""
    def repl(m):
        full = m.group(0)
        parts = full.split(".")
        for k in range(len(parts), 1, -1):
            mod = ".".join(parts[:k])
            if mod in link_names["modules"]:
                rest = parts[k:]
                anchor = f"#{rest[0]}" if rest else ""
                return f'<a href="{mod}.html{anchor}">{full}</a>'
        return full
    return re.sub(r"\bmici_tpu(?:\.\w+)+", repl, escaped)


def _render_doc(doc, link_names):
    """Render a docstring: paragraphs, simple lists, indented code blocks."""
    if not doc:
        return ""
    lines = doc.splitlines()
    blocks, i = [], 0
    while i < len(lines):
        line = lines[i]
        if not line.strip():
            i += 1
            continue
        if line.startswith(("    ", "\t")) or line.strip().startswith(">>>"):
            code = []
            while i < len(lines) and (not lines[i].strip()
                                      or lines[i].startswith(("    ", "\t"))
                                      or lines[i].strip().startswith(">>>")):
                code.append(lines[i])
                i += 1
            while code and not code[-1].strip():
                code.pop()
            body = html.escape("\n".join(
                c[4:] if c.startswith("    ") else c for c in code))
            blocks.append(f"<pre><code>{body}</code></pre>")
            continue
        if re.match(r"^\s*[-*]\s+", line):
            items = []
            while i < len(lines) and (re.match(r"^\s*[-*]\s+", lines[i])
                                      or (items and lines[i].startswith("  ")
                                          and lines[i].strip())):
                if re.match(r"^\s*[-*]\s+", lines[i]):
                    items.append(re.sub(r"^\s*[-*]\s+", "", lines[i]))
                else:
                    items[-1] += " " + lines[i].strip()
                i += 1
            lis = "".join(f"<li>{_inline_md(it, link_names)}</li>"
                          for it in items)
            blocks.append(f"<ul>{lis}</ul>")
            continue
        para = []
        while i < len(lines) and lines[i].strip() \
                and not lines[i].startswith(("    ", "\t")) \
                and not re.match(r"^\s*[-*]\s+", lines[i]):
            para.append(lines[i].strip())
            i += 1
        blocks.append(f"<p>{_inline_md(' '.join(para), link_names)}</p>")
    return "\n".join(blocks)


def _signature(obj):
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # Callable defaults repr as "<function name at 0x7f...>" or
    # "<bound method Cls.meth of <pkg.Cls object at 0x7f...>>", which
    # embeds a per-process memory address — regenerating the site would
    # then dirty every page containing one.  Rewrite to the stable
    # qualified name.
    sig = re.sub(
        r"<bound method ([\w.<>]+) of [^>]*(?:>[^>]*)*?>>",
        r"\1",
        sig,
    )
    return re.sub(
        r"<(?:function|built-in function) ([\w.<>]+)"
        r"(?: at 0x[0-9a-f]+)?>",
        r"\1",
        sig,
    )


def _public_members(module):
    names = getattr(module, "__all__", None)
    if names is None:
        names = [n for n in vars(module) if not n.startswith("_")]
    for name in sorted(names):
        obj = getattr(module, name, None)
        if obj is None or inspect.ismodule(obj):
            continue
        defined_in = getattr(obj, "__module__", module.__name__)
        if not (defined_in or "").startswith("mici_tpu"):
            continue
        if inspect.isclass(obj) or inspect.isfunction(obj):
            yield name, obj


def _page(title, nav, body, depth=0):
    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{html.escape(title)} — mici_tpu</title>
<style>{CSS}</style></head>
<body><div class="layout">
<nav>{nav}</nav>
<main>{body}
<footer>mici_tpu — TPU-native Hamiltonian Monte Carlo.
Generated by <code>python docs/gen_site.py</code>.</footer>
</main></div></body></html>
"""


def _nav(modules, current=None):
    parts = ['<h2>Guides</h2>']
    parts.append('<a href="index.html">Index</a>')
    for fname, _, title in GUIDES:
        parts.append(f'<a href="{Path(fname).stem}.html">{title}</a>')
    parts.append("<h2>API</h2>")
    for mod in modules:
        label = mod if mod == "mici_tpu" else "." + mod.split(".", 1)[1]
        cls = ' style="font-weight:600"' if mod == current else ""
        parts.append(f'<a href="{mod}.html"{cls}>{label}</a>')
    return "\n".join(parts)


def _render_module(mod_name, link_names, nav):
    module = importlib.import_module(mod_name)
    body = [f"<h1><code>{mod_name}</code></h1>"]
    body.append(_render_doc(inspect.getdoc(module), link_names))
    toc = [f'<li><a href="#{name}"><code>{name}</code></a></li>'
           for name, _ in _public_members(module)]
    if toc:
        body.append(f"<ul>{''.join(toc)}</ul>")
    for name, obj in _public_members(module):
        kind = "class" if inspect.isclass(obj) else "function"
        body.append(f'<h2 id="{name}"><span class="kind">{kind}</span> '
                    f'<code>{name}</code></h2>')
        body.append(f'<div class="sig"><code>{html.escape(name + _signature(obj))}'
                    f"</code></div>")
        body.append(_render_doc(inspect.getdoc(obj), link_names))
        if inspect.isclass(obj):
            for m_name, member in sorted(vars(obj).items()):
                if m_name.startswith("_"):
                    continue
                if isinstance(member, property):
                    doc = inspect.getdoc(member.fget) if member.fget else ""
                    body.append(
                        f'<div class="member"><span class="kind">property'
                        f"</span> <code>{m_name}</code>"
                        f"{_render_doc(doc, link_names)}</div>")
                elif inspect.isfunction(member):
                    if not member.__doc__:
                        continue
                    body.append(
                        f'<div class="member"><span class="kind">method'
                        f"</span> <code>"
                        f"{html.escape(m_name + _signature(member))}</code>"
                        f"{_render_doc(inspect.getdoc(member), link_names)}"
                        f"</div>")
    return _page(mod_name, nav, "\n".join(body))


def _render_markdown(text, link_names):
    """Small markdown renderer for the hand-written guides."""
    lines = text.splitlines()
    out, i = [], 0
    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            code, i = [], i + 1
            while i < len(lines) and not lines[i].startswith("```"):
                code.append(lines[i])
                i += 1
            i += 1
            out.append(f"<pre><code>{html.escape(chr(10).join(code))}"
                       f"</code></pre>")
            continue
        m = re.match(r"^(#{1,4})\s+(.*)", line)
        if m:
            level = len(m.group(1))
            out.append(f"<h{level}>{_inline_md(m.group(2), link_names)}"
                       f"</h{level}>")
            i += 1
            continue
        if "|" in line and i + 1 < len(lines) \
                and re.match(r"^\s*\|?[\s:|-]+\|[\s:|-]*$", lines[i + 1]):
            header = [c.strip() for c in line.strip().strip("|").split("|")]
            i += 2
            rows = []
            while i < len(lines) and "|" in lines[i] and lines[i].strip():
                rows.append([c.strip() for c in
                             lines[i].strip().strip("|").split("|")])
                i += 1
            ths = "".join(f"<th>{_inline_md(h, link_names)}</th>"
                          for h in header)
            trs = "".join(
                "<tr>" + "".join(f"<td>{_inline_md(c, link_names)}</td>"
                                 for c in row) + "</tr>"
                for row in rows)
            out.append(f"<table><tr>{ths}</tr>{trs}</table>")
            continue
        if re.match(r"^\s*([-*]|\d+\.)\s+", line):
            items = []
            while i < len(lines) and (re.match(r"^\s*([-*]|\d+\.)\s+", lines[i])
                                      or (items and lines[i].startswith("  ")
                                          and lines[i].strip())):
                if re.match(r"^\s*([-*]|\d+\.)\s+", lines[i]):
                    items.append(re.sub(r"^\s*([-*]|\d+\.)\s+", "", lines[i]))
                else:
                    items[-1] += " " + lines[i].strip()
                i += 1
            tag = "ol" if re.match(r"^\s*\d+\.", line) else "ul"
            lis = "".join(f"<li>{_inline_md(it, link_names)}</li>"
                          for it in items)
            out.append(f"<{tag}>{lis}</{tag}>")
            continue
        if not line.strip():
            i += 1
            continue
        para = []
        while i < len(lines) and lines[i].strip() \
                and not lines[i].startswith(("#", "```")) \
                and not re.match(r"^\s*([-*]|\d+\.)\s+", lines[i]) \
                and "|" not in lines[i]:
            para.append(lines[i].strip())
            i += 1
        if para:
            out.append(f"<p>{_inline_md(' '.join(para), link_names)}</p>")
        else:
            i += 1
    return "\n".join(out)


def main():
    OUT_DIR.mkdir(exist_ok=True)
    link_names = {"modules": set(MODULES)}
    nav = _nav(MODULES)

    for mod_name in MODULES:
        page = _render_module(mod_name, link_names, _nav(MODULES, mod_name))
        (OUT_DIR / f"{mod_name}.html").write_text(page)

    docs_dir = Path(__file__).parent
    for fname, rel, title in GUIDES:
        src = (docs_dir / rel).resolve()
        if not src.exists():
            continue
        body = (f"<h1>{html.escape(title)}</h1>"
                + _render_markdown(src.read_text(), link_names))
        (OUT_DIR / f"{Path(fname).stem}.html").write_text(
            _page(title, nav, body))

    # Index: intro + full API name index
    entries = []
    for mod_name in MODULES:
        module = importlib.import_module(mod_name)
        for name, obj in _public_members(module):
            if getattr(obj, "__module__", None) == mod_name or \
                    mod_name == "mici_tpu":
                entries.append((name, mod_name))
    entries.sort(key=lambda e: e[0].lower())
    index_items = "".join(
        f'<li><a href="{mod}.html#{name}"><code>{name}</code></a> '
        f'<span class="kind">{mod}</span></li>'
        for name, mod in entries)
    body = f"""<h1>mici_tpu documentation</h1>
<p>TPU-native Hamiltonian Monte Carlo: the full capability surface of
reference Mici (<code>matt-graham/mici</code>) re-designed for JAX/XLA on
TPU — vmapped lockstep chains, mesh-sharded scaling, compiled NUTS with
depth-tail re-batching, structured-matrix pytrees with Pallas hot paths,
and streaming on-device trace summaries.</p>
<p>Start with the <a href="README.html">overview</a>, the
<a href="DESIGN.html">design notes</a> (TPU cost model, architecture
decisions, negative results), and the
<a href="BENCHMARKS.html">benchmarks</a>.  The
<a href="PARITY.html">parity map</a> tracks every reference component;
each API docstring cites its reference counterpart as
<code>mici/&lt;file&gt;:&lt;lines&gt;</code>.</p>
<h2>API name index</h2>
<ul>{index_items}</ul>"""
    (OUT_DIR / "index.html").write_text(_page("Index", nav, body))
    print(f"wrote {len(MODULES) + len(GUIDES) + 1} pages to {OUT_DIR}")


if __name__ == "__main__":
    main()
