"""Importable custom-format fixture: importing this module registers the
``pipe2`` decoder — the ``format_module`` SPI hook the http DataSource
uses to discover custom formats in its own Python worker process."""

from flink_connector_http_spark.formats import register_format


def pipe2_decoder(body: bytes):
    header, *rows = body.decode("utf-8").strip().split("\n")
    cols = header.split("|")
    return [dict(zip(cols, r.split("|"))) for r in rows]


register_format("pipe2", pipe2_decoder)
