

def test_pii_counts_and_redact(spark):
    from neural_search_spark.functions import text as T
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org today"),
            (2, "server 192.168.1.10 and 10.0.0.1 rebooted"),
            (3, "call +1 555-010-0042 now"),
            (4, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    c = T.pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", c["n_emails"].alias("e"), c["n_ips"].alias("i"),
            c["n_phones"].alias("p"), T.pii_redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (1, 0, 0)
    assert out[1]["red"] == "mail me at [EMAIL] today"
    assert (out[2]["e"], out[2]["i"], out[2]["p"]) == (0, 2, 0)
    assert out[2]["red"] == "server [IP] and [IP] rebooted"
    assert (out[3]["e"], out[3]["i"], out[3]["p"]) == (0, 0, 1)
    assert out[3]["red"] == "call [PHONE] now"
    assert out[4]["red"] == "nothing sensitive here"
