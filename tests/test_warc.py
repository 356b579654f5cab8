"""WARC / JSONL web-corpus sources → the pages schema, end-to-end into
the extract stage."""

import gzip
import json

import pyarrow as pa
import pytest


def _warc_record(rec_type, url=None, date="2024-03-01T12:00:00Z",
                 body=b""):
    headers = [b"WARC/1.0",
               f"WARC-Type: {rec_type}".encode()]
    if url:
        headers.append(f"WARC-Target-URI: {url}".encode())
    headers.append(f"WARC-Date: {date}".encode())
    headers.append(f"Content-Length: {len(body)}".encode())
    return b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _http_body(html: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)


@pytest.fixture()
def warc_gz(tmp_path):
    html1 = (b"<html><body><p>John Smith works at Acme Corp and is one of "
             b"the leaders in the field.</p></body></html>")
    html2 = b"<html><body><p>Second page body text.</p></body></html>"
    records = [
        _warc_record("warcinfo", body=b"software: test\r\n"),
        _warc_record("request", url="https://x.example/a",
                     body=b"GET /a HTTP/1.1\r\n"),
        _warc_record("response", url="https://x.example/a",
                     body=_http_body(html1)),
        _warc_record("response", url="https://x.example/b",
                     date="2024-03-02T01:02:03Z", body=_http_body(html2)),
    ]
    # Common Crawl layout: one gzip member per record
    p = tmp_path / "shard-00000.warc.gz"
    with open(p, "wb") as f:
        for r in records:
            f.write(gzip.compress(r))
    return str(p), html1, html2


def test_parse_warc_shard(warc_gz):
    from stanford_re_ray.sources.warc import parse_warc_shard

    path, html1, html2 = warc_gz
    t = parse_warc_shard(open(path, "rb").read())
    assert t.num_rows == 2                      # responses only
    assert t.column("url").to_pylist() == ["https://x.example/a",
                                           "https://x.example/b"]
    assert t.column("html").to_pylist() == [html1, html2]
    ts = t.column("warc_ts").to_pylist()
    assert ts[0].year == 2024 and ts[0].hour == 12
    assert ts[1].second == 3


def test_parse_warc_plain_and_multi_record_member(tmp_path):
    """Uncompressed WARC and several records in one member both parse."""
    from stanford_re_ray.sources.warc import parse_warc_shard

    recs = (_warc_record("response", url="u1", body=_http_body(b"<p>a</p>"))
            + _warc_record("response", url="u2",
                           body=_http_body(b"<p>b</p>")))
    t = parse_warc_shard(recs)
    assert t.column("url").to_pylist() == ["u1", "u2"]
    t2 = parse_warc_shard(gzip.compress(recs))   # one member, two records
    assert t2.column("url").to_pylist() == ["u1", "u2"]


def test_read_warc_into_extract_stage(ray_session, warc_gz):
    """WARC pages carry no language metadata: extract with lang='' (keep
    all), then lang-id annotates, then the standard filter applies."""
    from stanford_re_ray.pipelines.kg import extract_stage
    from stanford_re_ray.sources.warc import annotate_lang, read_warc
    from stanford_re_ray.stages.extract import filter_lang

    path, _, _ = warc_gz
    pages = read_warc([path])
    docs = extract_stage(pages, lang="")
    docs = annotate_lang(docs)
    df = docs.to_pandas()
    assert len(df) == 2
    row = df[df["url"] == "https://x.example/a"].iloc[0]
    assert "John Smith works at Acme Corp" in row["text"]
    assert row["lang"] == "en"          # the/and/is/of/in hit the markers
    en_only = docs.map_batches(lambda t: filter_lang(t, "en"),
                               batch_format="pyarrow").to_pandas()
    assert "https://x.example/a" in set(en_only["url"])


def test_read_pages_jsonl(ray_session, tmp_path):
    from stanford_re_ray.pipelines.kg import extract_stage
    from stanford_re_ray.sources.warc import read_pages_jsonl

    p = tmp_path / "docs.jsonl"
    rows = [
        {"url": "https://j.example/1", "warc_ts": 1709294400,
         "html": "<html><body><p>Jane Doe leads Beta Inc.</p></body></html>",
         "lang": "en"},
        {"url": "https://j.example/2",
         "text": "plain text only page"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    pages = read_pages_jsonl(str(p))
    t = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(t["url"]) == ["https://j.example/1", "https://j.example/2"]
    assert t["warc_ts"].iloc[0].year == 2024
    docs = extract_stage(pages).to_pandas()
    assert any("Jane Doe leads Beta Inc." in x for x in docs["text"])


def test_cli_kg_warc_format(ray_session, tmp_path, capsys, warc_gz):
    """`kg --format warc` runs the checkpointed pipeline straight off a
    .warc.gz shard (language filter off)."""
    import json

    import numpy as np

    from stanford_re_ray.cli import main
    from stanford_re_ray.relations import RELATION_NAMES
    from stanford_re_ray.stages.classify import D_FEATURES, LRModel

    # tiny throwaway model: uniform negative weights -> zero triples is
    # fine; the test pins ingestion + checkpoint mechanics, not recall
    R = len(RELATION_NAMES)
    LRModel(np.zeros((R, D_FEATURES), dtype=np.float32),
            np.full(R, -5.0, dtype=np.float32)).save(
        str(tmp_path / "model.parquet"))
    path, _, _ = warc_gz
    rc = main(["kg", "--pages", path, "--format", "warc",
               "--model", str(tmp_path / "model.parquet"),
               "--out", str(tmp_path / "warc_out")])
    assert rc == 0
    run = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert run["processed"] == 1 and not run["failed"]
    assert (tmp_path / "warc_out" / "triples").is_dir()
