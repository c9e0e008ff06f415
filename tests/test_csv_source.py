"""CSV document source (sources/csv_docs.py): clean/quarantine split."""


def test_csv_source_splits_clean_and_quarantine(spark, tmp_path):
    csv = tmp_path / "docs.csv"
    csv.write_text(
        'doc_id,text,lang,source\n'
        '1,"hello world",en,web\n'
        '2,"multi\nline text",en,web\n'          # legal quoted newline
        'not_a_number,"bad id",en,web\n'          # type failure -> corrupt
        '4,,en,web\n'                             # missing text
        ',"no id",en,web\n'                       # missing doc_id
        '5,"fine",de,books\n'
    )
    from factstore_spark.sources.csv_docs import read_documents_csv

    clean, quarantine, release = read_documents_csv(spark, str(csv))
    got = {r.doc_id: (r.text, r.lang, r.source) for r in clean.collect()}
    assert got == {
        1: ("hello world", "en", "web"),
        2: ("multi\nline text", "en", "web"),
        5: ("fine", "de", "books"),
    }
    q = {(r.reason) for r in quarantine.collect()}
    assert q == {"unparseable line", "missing text", "missing doc_id"}
    assert quarantine.count() == 3
    raws = [r.raw for r in quarantine.collect() if r.reason == "unparseable line"]
    assert raws and "not_a_number" in raws[0]  # original line preserved for review
    release()  # unpersists the shared parsed parent
