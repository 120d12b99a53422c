"""Common-Crawl-style pages table: synthesis, extraction, geocoding."""
