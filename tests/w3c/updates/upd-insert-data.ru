INSERT DATA { <urn:new> <urn:name> "New" }
