INSERT DATA { <urn:dave> <urn:name> "Dave" } ;
INSERT { ?s <urn:seen> "1" } WHERE { ?s <urn:name> "Dave" }
