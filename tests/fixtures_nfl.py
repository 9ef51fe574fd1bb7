"""Synthetic NFL-domain fixtures per FIXTURES.md: a handful of plays
with known filter outcomes so each cleaning stage is assertable.

Play roster (game 1001):
- play 1: valid 1v1 play, right direction, ball lands on receiver
          -> survives everything.
- play 2: valid 1v1 play, LEFT direction (exercises the flip math),
          ball lands near defender -> survives.
- play 3: the closest defender is a linebacker, not a DB -> dropped
          by the 1v1 (exactly-one-DB) filter, which runs after the
          closest-defender pick (reference order).
- play 4: ball lands 20 yards away from both -> dropped by the
          ball-distance filter.
- play 5: no after-throw data at all -> dropped by the before/after
          sync.
- play 6: route SLANT -> dropped by the plays route filter.
"""

from __future__ import annotations


def _player_rows(
    game_id, play_id, nfl_id, role, side, position, direction, frames, xy0, vxy,
    name=None, s=5.0, o=90.0, d=45.0, ball=(50.0, 20.0),
):
    rows = []
    for f in range(1, frames + 1):
        rows.append(
            dict(
                game_id=game_id,
                play_id=play_id,
                nfl_id=nfl_id,
                frame_id=f,
                play_direction=direction,
                player_side=side,
                player_role=role,
                player_name=name or f"Player {nfl_id}",
                player_height="6-2",
                player_weight=200.0,
                player_birth_date="1995-01-01",
                player_position=position,
                x=round(xy0[0] + vxy[0] * (f - 1), 2),
                y=round(xy0[1] + vxy[1] * (f - 1), 2),
                s=s,
                a=0.5,
                dir=d,
                o=o,
                absolute_yardline_number=50.0,
                ball_land_x=ball[0],
                ball_land_y=ball[1],
                week=1 if play_id in (1, 3, 5) else 10,
            )
        )
    return rows


def make_tracking_before():
    rows = []
    # play 1: QB(1) + receiver(2) + DB(3) + other-route runner(4)
    rows += _player_rows(1001, 1, 1, "Passer", "Offense", "QB", "right", 5, (20.0, 25.0), (0.1, 0.0), s=2.0)
    rows += _player_rows(1001, 1, 2, "Targeted Receiver", "Offense", "WR", "right", 5, (45.0, 20.0), (1.0, 0.0), s=7.0)
    rows += _player_rows(1001, 1, 3, "Defensive Coverage", "Defense", "CB", "right", 5, (47.0, 21.0), (1.0, 0.0), s=6.0, o=250.0)
    rows += _player_rows(1001, 1, 4, "Other Route Runner", "Offense", "WR", "right", 5, (40.0, 10.0), (0.5, 0.0))
    # play 2: left direction; ball lands near defender's last spot
    rows += _player_rows(1001, 2, 1, "Passer", "Offense", "QB", "left", 4, (90.0, 25.0), (0.0, 0.0), s=1.0, ball=(60.0, 30.0))
    rows += _player_rows(1001, 2, 5, "Targeted Receiver", "Offense", "WR", "left", 4, (70.0, 28.0), (-1.0, 0.0), s=6.5, ball=(60.0, 30.0))
    rows += _player_rows(1001, 2, 6, "Defensive Coverage", "Defense", "FS", "left", 4, (66.0, 29.0), (-2.0, 0.5), s=8.0, ball=(60.0, 30.0))
    # play 3: closest defender (8) is an LB; the DB (9) is farther
    rows += _player_rows(1001, 3, 1, "Passer", "Offense", "QB", "right", 4, (20.0, 25.0), (0.0, 0.0))
    rows += _player_rows(1001, 3, 7, "Targeted Receiver", "Offense", "WR", "right", 4, (45.0, 20.0), (1.0, 0.0))
    rows += _player_rows(1001, 3, 8, "Defensive Coverage", "Defense", "LB", "right", 4, (47.0, 21.0), (1.0, 0.0))
    rows += _player_rows(1001, 3, 9, "Defensive Coverage", "Defense", "SS", "right", 4, (52.0, 26.0), (1.0, 0.0))
    # play 4: ball lands far from everyone
    rows += _player_rows(1001, 4, 1, "Passer", "Offense", "QB", "right", 4, (20.0, 25.0), (0.0, 0.0), ball=(110.0, 50.0))
    rows += _player_rows(1001, 4, 10, "Targeted Receiver", "Offense", "WR", "right", 4, (45.0, 20.0), (1.0, 0.0), ball=(110.0, 50.0))
    rows += _player_rows(1001, 4, 11, "Defensive Coverage", "Defense", "CB", "right", 4, (47.0, 21.0), (1.0, 0.0), ball=(110.0, 50.0))
    # play 5: valid-looking but no after-throw rows
    rows += _player_rows(1001, 5, 1, "Passer", "Offense", "QB", "right", 4, (20.0, 25.0), (0.0, 0.0))
    rows += _player_rows(1001, 5, 12, "Targeted Receiver", "Offense", "WR", "right", 4, (45.0, 20.0), (1.0, 0.0))
    rows += _player_rows(1001, 5, 13, "Defensive Coverage", "Defense", "CB", "right", 4, (47.0, 21.0), (1.0, 0.0))
    # play 6: SLANT route (dropped at the plays stage, but tracking exists)
    rows += _player_rows(1001, 6, 1, "Passer", "Offense", "QB", "right", 4, (20.0, 25.0), (0.0, 0.0))
    rows += _player_rows(1001, 6, 14, "Targeted Receiver", "Offense", "WR", "right", 4, (45.0, 20.0), (1.0, 0.0))
    rows += _player_rows(1001, 6, 15, "Defensive Coverage", "Defense", "CB", "right", 4, (47.0, 21.0), (1.0, 0.0))
    return rows


def make_tracking_after():
    rows = []
    keep = {
        1: [(2, (50.0, 20.0), (0.2, 0.0)), (3, (50.5, 20.5), (0.2, 0.0))],
        2: [(5, (66.0, 28.0), (-1.0, 0.5)), (6, (62.0, 30.0), (-0.7, 0.0))],
        3: [(7, (49.0, 20.0), (1.0, 0.0)), (8, (51.0, 21.0), (1.0, 0.0)), (9, (56.0, 26.0), (1.0, 0.0))],
        4: [(10, (49.0, 20.0), (1.0, 0.0)), (11, (51.0, 21.0), (1.0, 0.0))],
        # play 5 intentionally absent
        6: [(14, (49.0, 20.0), (1.0, 0.0)), (15, (51.0, 21.0), (1.0, 0.0))],
    }
    for play_id, players in keep.items():
        for nfl_id, xy0, vxy in players:
            for f in range(1, 4):
                rows.append(
                    dict(
                        game_id=1001,
                        play_id=play_id,
                        nfl_id=nfl_id,
                        frame_id=f,
                        x=round(xy0[0] + vxy[0] * (f - 1), 2),
                        y=round(xy0[1] + vxy[1] * (f - 1), 2),
                        s=5.0,
                        a=0.2,
                        dir=45.0,
                        o=90.0,
                        week=1 if play_id in (1, 3, 5) else 10,
                    )
                )
    return rows


def make_plays():
    base = dict(
        season=2023,
        quarter=2,
        game_clock="10:00",
        down=1,
        home_team_abbr="KC",
        visitor_team_abbr="BUF",
        play_description="pass play",
        yards_to_go=10,
        possession_team="KC",
        defensive_team="BUF",
        yardline_number=30,
        play_nullified_by_penalty="N",
        pass_length=12.0,
        offense_formation="SHOTGUN",
        receiver_alignment="2x2",
        play_action="False",
        dropback_type="TRADITIONAL",
        dropback_distance=3.0,
        team_coverage_man_zone="MAN_COVERAGE",
        team_coverage_type="COVER_1",
    )
    plays = []
    routes = {1: "OUT", 2: "IN", 3: "HITCH", 4: "OUT", 5: "IN", 6: "SLANT"}
    results = {1: "C", 2: "IN", 3: "C", 4: "I", 5: "C", 6: "C"}
    for pid in range(1, 7):
        plays.append(
            dict(
                game_id=1001,
                play_id=pid,
                week=1 if pid in (1, 3, 5) else 10,
                route_of_targeted_receiver=routes[pid],
                pass_result=results[pid],
                **base,
            )
        )
    return plays


def make_inference_results():
    """Per-frame probability series with known change-point structure."""
    rows = []

    def play(pid, probs, pass_result, rec=2, deff=3):
        for i, p in enumerate(probs, start=1):
            rows.append(
                dict(
                    game_id=1001,
                    play_id=pid,
                    frame_id=i,
                    receiver_id=rec,
                    defender_id=deff,
                    pass_result=pass_result,
                    non_completion_probability=p,
                )
            )

    # clear mean shift at frame 10 (on the jump=5 lattice)
    play(1, [0.2] * 10 + [0.8] * 10, "C")
    # flat series -> no change point -> last - first = 0.05
    play(2, [0.5, 0.51, 0.52, 0.53, 0.54, 0.55], "IN", rec=5, deff=6)
    # short series (< min_size*2): fallback path
    play(3, [0.3, 0.6, 0.9], "I", rec=7, deff=8)
    return rows
