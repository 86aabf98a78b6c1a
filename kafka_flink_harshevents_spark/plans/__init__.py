"""Pipeline assembly (SURVEY.md §3.1): the full reference topology as
composable ``DataFrame → DataFrame`` stages shared by batch and
streaming bindings."""
