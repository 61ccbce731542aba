"""Extension-operator queries — filled in with dedup/similarity/text entries."""
