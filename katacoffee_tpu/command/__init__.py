"""CLI / protocol frontends — the equivalent of the reference's
`cpp/command/` + `cpp/main.cpp` subcommand dispatch (SURVEY.md §2.6)."""
