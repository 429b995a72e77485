"""S7/J3: AtoN CSV dimension scan + broadcast enrichment join
(FIXTURES.md B7: non-matching mmsi rows are dropped — inner semantics)."""

from __future__ import annotations


def test_aton_csv_enrich(spark, tmp_path):
    from pincspark.sources.dimensions import enrich_aton, read_aton_csv

    csv = tmp_path / "aton.csv"
    csv.write_text(
        "mmsi,name,region,type\n"
        "995336007,TANJUNG SAIMA BUOY,Straits,Buoy\n"
        "995331201,ONE FATHOM BANK,Straits,Lighthouse\n"
    )
    aton = read_aton_csv(spark, str(csv))

    stream = spark.createDataFrame(
        [(995336007, 21), (995331201, 6), (123456789, 1)],
        "mmsi BIGINT, messageType INT",
    )
    out = enrich_aton(stream, aton)
    rows = {r["mmsi"]: r for r in out.collect()}
    assert set(rows) == {995336007, 995331201}  # non-AtoN row dropped
    assert rows[995336007]["atonname"] == "TANJUNG SAIMA BUOY"
    assert rows[995331201]["type"] == "Lighthouse"

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
