"""Pure-Python oracle for the link-graph build — an independent, row-at-a-time
replica of the reference's pageLinkHandle semantics
(/root/reference/internal/wikiEntropy/wikiEntropy.go:156-279), used only to
check the distributed join implementation on small corpora."""

from __future__ import annotations

import re


def title_filter(s: str) -> str:
    return s.lower().replace("_", " ").strip()


def extract(html: bytes):
    s = html.decode("utf-8", errors="replace")
    m = re.search(r"<title>(.*?)</title>", s, re.S)
    if m is None:
        return None
    title = m.group(1)
    red = re.search(r'<meta http-equiv="refresh" content="0; url=([^"]+)">', s)
    if red:
        return {"text": title, "links": [], "redirect": red.group(1)}
    paras = re.findall(r"<p>(.*?)</p>", s, re.S)
    links = re.findall(r'<a href="([^"]+)">', s)
    return {"text": "\n".join([title] + paras), "links": links, "redirect": None}


def build_graph_oracle(pages: list[dict], id_of) -> dict:
    """pages: [{url, html}] → {vertices: {url: {...}}, edges: [(src,dst)],
    redirect_ids: {id: rid}, failed: [url]}.

    Mirrors wikiEntropy.go:156-279 with urls for titles; conflict rule =
    non-redirect over redirect else max id (engine's deterministic deviation).
    """
    vertices, failed = {}, []
    for p in pages:
        ext = extract(p["html"])
        if ext is None:
            failed.append(p["url"])
            continue
        vertices[p["url"]] = {**ext, "id": id_of(p["url"]), "url": p["url"]}

    def better(a, b):  # priority pick between two vertex dicts
        if (a["redirect"] is None) != (b["redirect"] is None):
            return a if a["redirect"] is None else b
        return a if a["id"] >= b["id"] else b

    origin, norm = {}, {}
    for v in vertices.values():
        k = v["url"]
        origin[k] = better(origin[k], v) if k in origin else v
        nk = title_filter(v["url"])
        norm[nk] = better(norm[nk], v) if nk in norm else v

    def chase(key: str, advance_on_norm_redirect: bool):
        """≤3-hop chase; returns resolved id or None (wikiEntropy.go:187-264)."""
        for _ in range(3):
            sub = origin.get(key)
            if sub is not None:
                if sub["redirect"] is not None:
                    key = sub["redirect"]
                    continue
                return sub["id"]
            nk = title_filter(key)
            sub = norm.get(nk)
            if sub is not None:
                if sub["redirect"] is not None:
                    if advance_on_norm_redirect:
                        key = sub["redirect"]   # links branch advances (:256)
                    # redirect branch does NOT advance (:209 quirk)
                    continue
                return sub["id"]
            return None
        return None

    redirect_ids = {}
    for v in origin.values():
        if v["redirect"] is not None:
            rid = chase(v["redirect"], advance_on_norm_redirect=False)
            if rid is not None and rid != v["id"]:
                redirect_ids[v["id"]] = rid

    edges = []
    for v in origin.values():
        for link in v["links"]:
            dst = chase(link, advance_on_norm_redirect=True)
            if dst is not None and dst != v["id"]:
                edges.append((v["id"], dst))
    return {
        "vertices": vertices, "edges": edges,
        "redirect_ids": redirect_ids, "failed": failed,
    }
