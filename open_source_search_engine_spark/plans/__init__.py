"""Query planning: query string -> QueryPlan -> DataFrame program
(the Query.cpp / Msg39 / PosdbTable chain of SURVEY.md §3.1)."""
