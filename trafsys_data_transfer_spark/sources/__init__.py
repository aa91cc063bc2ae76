"""Source adapters: fixture parquet loader, TrafSys REST source, OAuth."""
