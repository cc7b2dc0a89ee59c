"""S4 loadTweets semantics (RecordLoader.scala:48-50): tombstone drop +
parse-failure drop + TweetUtils accessor defaults."""

import os


def test_load_tweets_file(spark, tmp_path):
    lines = [
        '{"delete": {"status": {"id": 1}}}',                     # tombstone → dropped
        "not json at all",                                        # parse failure → dropped
        '{"id_str": "10", "text": "hi", "lang": "en"}',           # kept, no user
        '{"id_str": "11", "text": "yo", "lang": "de", '
        '"user": {"screen_name": "alice", "verified": true, '
        '"followers_count": 42, "friends_count": 7}}',            # kept, full
        '{"truncated": ',                                         # parse failure → dropped
    ]
    p = tmp_path / "tweets.jsonl"
    p.write_text("\n".join(lines) + "\n")

    from warcbase_spark.sources.tweets import load_tweets, tweets_table

    kept = load_tweets(spark, str(p))
    assert kept.count() == 2

    rows = {r["id"]: r for r in tweets_table(spark.read.text(str(p))).collect()}
    assert set(rows) == {"10", "11"}
    assert rows["10"]["username"] is None
    assert rows["10"]["verified"] is False and rows["10"]["follower_count"] == 0
    assert rows["11"]["username"] == "alice"
    assert rows["11"]["verified"] is True
    assert rows["11"]["follower_count"] == 42 and rows["11"]["friend_count"] == 7


def test_load_tweets_plan_is_jvm_only(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"id_str": "1"}\n')
    from warcbase_spark.sources.tweets import load_tweets

    plan = load_tweets(spark, str(p))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure Catalyst predicates, no Python
