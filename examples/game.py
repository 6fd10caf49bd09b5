"""The mobile-gaming example family (reference
``examples/complete/game/`` — user_score, hourly_team_score,
game_stats), on this engine, runnable end-to-end against the fixture
events table.

Usage:
    python examples/game.py [sf_dir]     # default /root/testdata/sf0.001

Prints the top users by total score, one hourly team-score sample
window, the spammy-user list, and mean session length per start hour —
the same four computations the reference's game examples publish to
BigQuery, each defined in ``incubator_beam_spark/queries/game.py`` with
an exact DuckDB oracle."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_beam_spark.queries.game import (  # noqa: E402
    game_hourly_team_score,
    game_session_activity,
    game_spammy_users,
    game_user_score,
)
from incubator_beam_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("game-examples", cpus=8)

    print("== user_score: top 5 users by total score (cents) ==")
    game_user_score(spark, sf_dir).orderBy("score_c", ascending=False).show(5)

    print("== hourly_team_score: 5 sample (window, team) rows ==")
    game_hourly_team_score(spark, sf_dir).orderBy(
        "window_start", "team"
    ).show(5)

    print("== game_stats/spammy_users ==")
    game_spammy_users(spark, sf_dir).show(10)

    print("== game_stats/session activity: mean session minutes per hour ==")
    game_session_activity(spark, sf_dir).orderBy("window_start").show(5)


if __name__ == "__main__":
    main()
