"""Text-analysis pipeline queries (training-data extensions). Filled in
incrementally — see operators/textstats.py for the column builders."""
