"""PII scrubbing (email / IPv4 / phone redaction with category counts)."""

import pyspark.sql.functions as F

from webdedup.scrub import scrub_pii


def _scrub_one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    cols = scrub_pii(F.col("text"))
    return df.select(
        *(cols[k].alias(k) for k in ("n_email", "n_ipv4", "n_phone", "scrubbed"))
    ).collect()[0]


def test_scrub_all_categories(spark):
    r = _scrub_one(
        spark,
        "mail a.b+c@sub.example.org or call +44 123 4567 from 192.168.0.1 now",
    )
    assert (r.n_email, r.n_ipv4, r.n_phone) == (1, 1, 1)
    assert r.scrubbed == "mail <EMAIL> or call <PHONE> from <IP> now"


def test_scrub_no_pii_passthrough(spark):
    text = "nothing sensitive here, just words and the number 7"
    r = _scrub_one(spark, text)
    assert (r.n_email, r.n_ipv4, r.n_phone) == (0, 0, 0)
    assert r.scrubbed == text


def test_scrub_ordering_no_double_count(spark):
    # alphabetic-TLD email with digits in the domain is consumed by the
    # email pass BEFORE the ipv4 pass ever sees its digit runs; a purely
    # numeric domain is NOT an email (TLD must be letters) and falls
    # through to the ipv4 pass instead
    r = _scrub_one(spark, "a@10.0.0.1.example.com and root@10.0.0.1")
    assert (r.n_email, r.n_ipv4) == (1, 1)
    assert r.scrubbed == "<EMAIL> and root@<IP>"


def test_scrub_multiple_matches(spark):
    r = _scrub_one(spark, "a@b.io c@d.io +1 555 0100 +1 555 0200")
    assert (r.n_email, r.n_phone) == (2, 2)
    assert r.scrubbed == "<EMAIL> <EMAIL> <PHONE> <PHONE>"
