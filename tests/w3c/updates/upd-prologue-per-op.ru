PREFIX ex: <urn:>
INSERT DATA { ex:new1 ex:mark 1 } ;
PREFIX ey: <urn:y:>
INSERT DATA { ey:new2 ex:mark 2 }
