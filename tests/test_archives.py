"""tar.gz member streaming scan (S7): distributed unpack via mapInPandas."""

import io
import tarfile

from translator_ingests_spark.sources.archives import read_targz_members


def _make_targz(path, members: dict[str, str]):
    with tarfile.open(path, "w:gz") as tf:
        for name, text in members.items():
            data = text.encode()
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def test_targz_member_scan(spark, tmp_path):
    _make_targz(
        tmp_path / "a.tar.gz",
        {
            "edges/part1.tsv": "s1\tp\to1\t5\ns2\tp\to2\t7\n",
            "edges/part2.tsv": "s3\tq\to3\t9\n",
            "README.txt": "ignore me",
        },
    )
    _make_targz(tmp_path / "b.tar.gz", {"more.tsv": "s4\tq\to4\t11\n"})

    df = read_targz_members(
        spark,
        str(tmp_path / "*.tar.gz"),
        columns=[("subject", "string"), ("predicate", "string"),
                 ("object", "string"), ("score", "int")],
        member_suffix=".tsv",
    )
    rows = sorted((r["subject"], r["predicate"], r["score"]) for r in df.collect())
    assert rows == [("s1", "p", 5), ("s2", "p", 7), ("s3", "q", 9), ("s4", "q", 11)]
    # non-matching members skipped; member provenance retained
    members = {r["_member"] for r in df.select("_member").distinct().collect()}
    assert members == {"edges/part1.tsv", "edges/part2.tsv", "more.tsv"}
